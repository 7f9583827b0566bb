"""Output table schemas and input read options.

Parity notes (reference: /root/reference):
  * Five fixed output schemas — all ``string`` except
    ``MUTATION_EVENT_ID: long`` (mutation/transformer.go:254-309,
    cna/transformer.go:438-459).
  * Input TSVs are read with every column typed string — the reference's
    schema inference only reads the header row for names
    (cna/reader.go:15-33, mutation/reader.go:15-46). Spark's CSV reader
    with ``inferSchema=False`` (the default) matches this exactly.
  * Missing fields become ``""`` never NULL (mutation/transformer.go:324).
"""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType


def _string_struct(*names: str, leading_long: str | None = None) -> StructType:
    fields = []
    if leading_long:
        fields.append(StructField(leading_long, LongType(), nullable=False))
    fields.extend(StructField(n, StringType(), nullable=True) for n in names)
    return StructType(fields)


# cna/transformer.go:438-443
GENETIC_ALTERATIONS_SCHEMA = _string_struct(
    "CANCER_STUDY", "GENETIC_PROFILE", "GENE_SYMBOL", "VALUES"
)

# cna/transformer.go:446-450
GENETIC_PROFILE_SAMPLES_SCHEMA = _string_struct(
    "CANCER_STUDY", "GENETIC_PROFILE", "ORDERED_SAMPLE_LIST"
)

# cna/transformer.go:453-459
CNA_DERIVED_SCHEMA = _string_struct(
    "SAMPLE_ID", "CANCER_STUDY", "GENE_SYMBOL", "GENETIC_PROFILE", "ALTERATION"
)

# mutation/transformer.go:254-276 — (output column, MAF source column | None)
# None source => always-empty output (mutation/transformer.go:364-371).
MUTATION_EVENT_COLUMNS: list[tuple[str, str | None]] = [
    ("ENTREZ_GENE_ID", "Entrez_Gene_Id"),
    ("CHR", "Chromosome"),
    ("START_POSITION", "Start_Position"),
    ("END_POSITION", "End_Position"),
    ("REFERENCE_ALLELE", "Reference_Allele"),
    ("TUMOR_SEQ_ALLELE", "Tumor_Seq_Allele2"),
    ("PROTEIN_CHANGE", "HGVSp_Short"),
    ("MUTATION_TYPE", "Variant_Classification"),
    ("NCBI_BUILD", "NCBI_Build"),
    ("STRAND", "Strand"),
    ("VARIANT_TYPE", "Variant_Type"),
    ("DB_SNP_RS", "dbSNP_RS"),
    ("DB_SNP_VAL_STATUS", "dbSNP_Val_Status"),
    ("REFSEQ_MRNA_ID", None),
    ("CODON_CHANGE", None),
    ("UNIPROT_ACCESSION", None),
    ("PROTEIN_POS_START", None),
    ("PROTEIN_POS_END", None),
    ("CANONICAL_TRANSCRIPT", None),
    ("KEYWORD", None),
]

MUTATION_EVENT_SCHEMA = _string_struct(
    *[c for c, _ in MUTATION_EVENT_COLUMNS], leading_long="MUTATION_EVENT_ID"
)

# mutation/transformer.go:279-309 — (output column, MAF source column | None).
# GENETIC_PROFILE_ID / SAMPLE_ID are computed (transformer.go:376-380);
# ANNOTATION_JSON is always "" (transformer.go:407).
MUTATION_COLUMNS: list[tuple[str, str | None]] = [
    ("ENTREZ_GENE_ID", "Entrez_Gene_Id"),
    ("CENTER", "Center"),
    ("SEQUENCER", "Sequencer"),
    ("MUTATION_STATUS", "Mutation_Status"),
    ("VALIDATION_STATUS", "Validation_Status"),
    ("TUMOR_SEQ_ALLELE1", "Tumor_Seq_Allele1"),
    ("TUMOR_SEQ_ALLELE2", "Tumor_Seq_Allele2"),
    ("MATCHED_NORM_SAMPLE_BARCODE", "Matched_Norm_Sample_Barcode"),
    ("MATCH_NORM_SEQ_ALLELE1", "Match_Norm_Seq_Allele1"),
    ("MATCH_NORM_SEQ_ALLELE2", "Match_Norm_Seq_Allele2"),
    ("TUMOR_VALIDATION_ALLELE1", "Tumor_Validation_Allele1"),
    ("TUMOR_VALIDATION_ALLELE2", "Tumor_Validation_Allele2"),
    ("MATCH_NORM_VALIDATION_ALLELE1", "Match_Norm_Validation_Allele1"),
    ("MATCH_NORM_VALIDATION_ALLELE2", "Match_Norm_Validation_Allele2"),
    ("VERIFICATION_STATUS", "Verification_Status"),
    ("SEQUENCING_PHASE", "Sequencing_Phase"),
    ("SEQUENCE_SOURCE", "Sequence_Source"),
    ("VALIDATION_METHOD", "Validation_Method"),
    ("SCORE", "Score"),
    ("BAM_FILE", "BAM_File"),
    ("TUMOR_ALT_COUNT", "t_alt_count"),
    ("TUMOR_REF_COUNT", "t_ref_count"),
    ("NORMAL_ALT_COUNT", "n_alt_count"),
    ("NORMAL_REF_COUNT", "n_ref_count"),
    ("AMINO_ACID_CHANGE", "HGVSp_Short"),
    ("ANNOTATION_JSON", None),
]

MUTATION_SCHEMA = _string_struct(
    "GENETIC_PROFILE_ID",
    "SAMPLE_ID",
    *[c for c, _ in MUTATION_COLUMNS],
    leading_long="MUTATION_EVENT_ID",
)
# Column order in the reference puts GENETIC_PROFILE_ID/SAMPLE_ID at
# positions 1-2, then the mapped columns 3..27, AMINO_ACID_CHANGE,
# ANNOTATION_JSON — _string_struct above preserves exactly that order.

# Output table kinds — filename suffixes (cna/transformer.go:266-297,
# cmd/cli/main.go:198-237,561-579).
TABLE_GENETIC_ALTERATIONS = "genetic_alterations"
TABLE_GENETIC_PROFILE_SAMPLES = "genetic_profile_samples"
TABLE_CNA_DERIVED = "derived"
TABLE_MUTATION_EVENT = "mutation_event"
TABLE_MUTATION = "mutation"

ALL_TABLES = {
    TABLE_GENETIC_ALTERATIONS: GENETIC_ALTERATIONS_SCHEMA,
    TABLE_GENETIC_PROFILE_SAMPLES: GENETIC_PROFILE_SAMPLES_SCHEMA,
    TABLE_CNA_DERIVED: CNA_DERIVED_SCHEMA,
    TABLE_MUTATION_EVENT: MUTATION_EVENT_SCHEMA,
    TABLE_MUTATION: MUTATION_SCHEMA,
}

# TSV read options (cna/reader.go:36-55; mutation/reader.go:49-69).
TSV_READ_OPTIONS = {
    "sep": "\t",
    "header": "true",
    # Reference types every column string; Spark default (no inferSchema)
    # matches. Do NOT enable inferSchema — parity hashing depends on it.
    "inferSchema": "false",
    # No-null contract (mutation/transformer.go:324): empty cells must
    # be "" not NULL. Spark's CSV reader maps empty unquoted fields to
    # null; pipeline builders coalesce every string column to "" as the
    # enforced guarantee (tested in tests/test_cna.py).
}

MAF_READ_OPTIONS = {**TSV_READ_OPTIONS, "comment": "#"}
