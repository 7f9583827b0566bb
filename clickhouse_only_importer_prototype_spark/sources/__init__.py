from clickhouse_only_importer_prototype_spark.sources.discovery import (  # noqa: F401
    CNAFileInput,
    MutationFileInput,
    discover_cna_files,
    discover_mutation_files,
    parse_meta_file,
)
from clickhouse_only_importer_prototype_spark.sources.tsv import (  # noqa: F401
    read_cna_matrix,
    read_maf,
)
