"""End-to-end pipeline integration tests over a fixture study tree —
the CLI parity surface (convert/combine modes) verified via DuckDB
reads of the written parquet.
"""

from __future__ import annotations

import duckdb
import pytest

from clickhouse_only_importer_prototype_spark.plans import pipelines


@pytest.fixture(scope="module")
def study_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("studies")
    a = root / "study_a"
    (a / "case_lists").mkdir(parents=True)
    (a / "meta_cna.txt").write_text(
        "cancer_study_identifier: study_a\nstable_id: gistic\n"
        "data_filename: data_cna.txt\n"
    )
    (a / "data_cna.txt").write_text(
        "Hugo_Symbol\tEntrez_Gene_Id\tS1\tS2\tS3\n"
        "TP53\t7157\t0\t-1\t2\n"
        "BRCA1\t672\t1\t0\t-2\n"
    )
    (a / "meta_mutations.txt").write_text(
        "cancer_study_identifier: study_a\nstable_id: mutations\n"
        "data_filename: data_mutations.txt\n"
    )
    (a / "data_mutations.txt").write_text(
        "#version 2.4\n"
        "Hugo_Symbol\tEntrez_Gene_Id\tChromosome\tStart_Position\t"
        "Tumor_Sample_Barcode\tt_alt_count\n"
        "TP53\t7157\t17\t7578406\tS1\t12\n"
        "BRCA1\t672\t13\t32914438\tS2\t8\n"
    )
    # decoys that must be ignored
    (a / "data_cna_seg.txt").write_text("x\n")
    (a / "case_lists" / "meta_cna.txt").write_text("cancer_study_identifier: nope\n")
    b = root / "study_b"
    b.mkdir()
    (b / "meta_cna.txt").write_text(
        "cancer_study_identifier: study_b\nstable_id: cna\n"
        "data_filename: data_cna.txt\n"
    )
    (b / "data_cna.txt").write_text(
        "Hugo_Symbol\tEntrez_Gene_Id\tT1\nEGFR\t1956\t1\n"
    )
    return root


def _read(path):
    return duckdb.sql(
        f"select * from read_parquet('{path}/*.parquet')"
    ).df()


def test_convert_cna_with_derived(spark, study_tree, tmp_path):
    out = tmp_path / "out"
    summary = pipelines.convert_cna(
        spark, str(study_tree), str(out), with_derived=True
    )
    assert summary.ok and len(summary.processed) == 2

    ga = _read(out / "study_a_data_cna_genetic_alterations.parquet")
    assert sorted(zip(ga.GENE_SYMBOL, ga.VALUES)) == [
        ("BRCA1", "1,0,-2"),
        ("TP53", "0,-1,2"),
    ]
    assert set(ga.GENETIC_PROFILE) == {"study_a_gistic"}

    gps = _read(out / "study_a_data_cna_genetic_profile_samples.parquet")
    assert len(gps) == 1  # 1-row invariant (cna/transformer.go:553-560)
    assert gps.ORDERED_SAMPLE_LIST[0] == "study_a_S1,study_a_S2,study_a_S3"

    derived = _read(out / "study_a_data_cna_derived.parquet")
    assert len(derived) == 6  # genes x samples
    assert set(derived.SAMPLE_ID) == {"study_a_S1", "study_a_S2", "study_a_S3"}


def test_convert_mutations_gapless_ids(spark, study_tree, tmp_path):
    out = tmp_path / "mout"
    summary = pipelines.convert_mutations(spark, str(study_tree), str(out))
    assert summary.ok

    ev = _read(out / "study_a_data_mutations_mutation_event.parquet")
    mut = _read(out / "study_a_data_mutations_mutation.parquet")
    assert sorted(ev.MUTATION_EVENT_ID) == [0, 1]  # dense, gapless, from 0
    assert sorted(mut.MUTATION_EVENT_ID) == [0, 1]  # FK co-generated
    assert set(mut.SAMPLE_ID) == {"study_a_S1", "study_a_S2"}
    # absent MAF columns become "" (mutation/transformer.go:324)
    assert set(ev.KEYWORD) == {""}
    assert all(ev.START_POSITION.isin(["7578406", "32914438"]))


def test_combine_union_all(spark, study_tree, tmp_path):
    out = tmp_path / "cout"
    pipelines.convert_cna(spark, str(study_tree), str(out), with_derived=True)
    counts = pipelines.combine_cna(spark, str(out), with_derived=True)
    assert counts == {
        "genetic_alterations": 2,
        "genetic_profile_samples": 2,
        "derived": 2,
    }
    combined = _read(out / "combined-all-cna_genetic_alterations.parquet")
    # duplicates preserved, both studies present
    assert len(combined) == 3
    assert set(combined.CANCER_STUDY) == {"study_a", "study_b"}


def test_combined_output_base_derivation(tmp_path):
    """Reference -output path rules (cmd/cli/main.go:198-237,561-579):
    relative joins parquet_dir, absolute used as-is, .parquet suffix
    stripped once before _<kind>.parquet is appended."""
    base = pipelines.combined_output_base("/pq", "my-run.parquet")
    assert base == "/pq/my-run"
    assert pipelines.combined_output_base("/pq", "my-run") == "/pq/my-run"
    abs_base = pipelines.combined_output_base("/pq", "/elsewhere/x.parquet")
    assert abs_base == "/elsewhere/x"
    # default matches the reference's flag default
    assert pipelines.DEFAULT_COMBINE_OUTPUT == "combined-all-cna.parquet"


def test_combine_with_output_override(spark, study_tree, tmp_path):
    out = tmp_path / "cout2"
    other = tmp_path / "other_dir"
    other.mkdir()
    pipelines.convert_cna(spark, str(study_tree), str(out), with_derived=False)
    counts = pipelines.combine_cna(
        spark, str(out), output=str(other / "merged.parquet")
    )
    assert counts["genetic_alterations"] == 2
    combined = _read(other / "merged_genetic_alterations.parquet")
    assert len(combined) == 3


def test_convert_cna_partitioned_matches_per_study(spark, study_tree, tmp_path):
    per_study = tmp_path / "per_study"
    single_job = tmp_path / "single_job"
    pipelines.convert_cna(spark, str(study_tree), str(per_study), with_derived=True)
    n = pipelines.convert_cna_partitioned(
        spark, str(study_tree), str(single_job), with_derived=True
    )
    assert n == 2

    def rows(q):
        return sorted(map(tuple, duckdb.sql(q).fetchall()))

    cols = "CANCER_STUDY, GENETIC_PROFILE, GENE_SYMBOL, VALUES"
    a = rows(
        f"select {cols} from read_parquet("
        f"'{per_study}/*_genetic_alterations.parquet/*.parquet')"
    )
    b = rows(
        f"select {cols} from read_parquet("
        f"'{single_job}/genetic_alterations.parquet/*/*/*.parquet', "
        f"hive_partitioning=true)"
    )
    assert a == b and len(a) == 3
    dcols = "SAMPLE_ID, CANCER_STUDY, GENE_SYMBOL, GENETIC_PROFILE, ALTERATION"
    da = rows(
        f"select {dcols} from read_parquet("
        f"'{per_study}/*_derived.parquet/*.parquet')"
    )
    db = rows(
        f"select {dcols} from read_parquet("
        f"'{single_job}/derived.parquet/*/*/*.parquet', hive_partitioning=true)"
    )
    assert da == db and len(da) == 7


def test_cli_query_oracle_mode(spark, sf_dir, capsys):
    """-oracle runs the registered query AND its DuckDB oracle on the
    same dir and exits 0 on the driver-identical triple match."""
    import pytest

    from clickhouse_only_importer_prototype_spark import cli

    rc = cli.main(
        ["-mode", "query", "-name", "region_rollup",
         "-parquet-dir", sf_dir, "-oracle"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "columns=MATCH rows=MATCH" in out and "values=MATCH" in out

    # rows-only queries have no oracle: the flag must fail loud
    with pytest.raises(SystemExit):
        cli.main(
            ["-mode", "query", "-name", "ann_cosine_topk_lsh",
             "-parquet-dir", sf_dir, "-oracle"]
        )


def test_convert_cna_parallel_equals_sequential(spark, study_tree, tmp_path):
    """max_workers>1 only changes SCHEDULING (concurrent independent
    per-study jobs); the written file set and every table's contents
    must be identical to the sequential loop."""
    import os

    seq, par = tmp_path / "seq", tmp_path / "par"
    pipelines.convert_cna(spark, str(study_tree), str(seq), with_derived=True)
    s = pipelines.convert_cna(
        spark, str(study_tree), str(par), with_derived=True, max_workers=4
    )
    assert s.ok and len(s.processed) == 2
    names = sorted(n for n in os.listdir(seq) if n.endswith(".parquet"))
    assert sorted(n for n in os.listdir(par) if n.endswith(".parquet")) == names
    for n in names:
        a = _read(seq / n)
        b = _read(par / n)
        key = list(a.columns)
        assert sorted(map(tuple, a[key].values.tolist())) == sorted(
            map(tuple, b[key].values.tolist())
        ), n


def test_convert_mutations_parallel_ids_identical(spark, study_tree, tmp_path):
    """The two-phase prefix-sum (count all files -> driver prefix-sum
    -> concurrent writes) must assign EXACTLY the ids the sequential
    loop assigns: dense, gapless, sorted-path order."""
    import os

    seq, par = tmp_path / "mseq", tmp_path / "mpar"
    pipelines.convert_mutations(spark, str(study_tree), str(seq))
    s = pipelines.convert_mutations(
        spark, str(study_tree), str(par), max_workers=4
    )
    assert s.ok
    names = sorted(n for n in os.listdir(seq) if n.endswith(".parquet"))
    assert sorted(n for n in os.listdir(par) if n.endswith(".parquet")) == names
    for n in names:
        a = _read(seq / n).sort_values("MUTATION_EVENT_ID")
        b = _read(par / n).sort_values("MUTATION_EVENT_ID")
        assert a.values.tolist() == b.values.tolist(), n


def test_convert_mutations_parallel_read_failure_consumes_no_ids(
    spark, tmp_path, monkeypatch
):
    """D4 isolation in parallel mode: a file that fails its READ
    (phase A) consumes no ids — later files' ids shift down exactly as
    in the sequential loop — and lands in the failure manifest. The
    failure is injected at the reader seam (PERMISSIVE CSV makes
    content-level read failures unreachable by construction, so the
    isolation logic itself is what needs the pin)."""
    root = tmp_path / "studies"
    for name, rows in (
        ("s_aa", ["TP53\t7157\t1\tSA"]),
        ("s_bb", ["BRAF\t673\t3\tSB"]),
        ("s_cc", ["EGFR\t1956\t5\tSC", "KRAS\t3845\t9\tSC"]),
    ):
        d = root / name
        d.mkdir(parents=True)
        (d / "meta_mutations.txt").write_text(
            f"cancer_study_identifier: {name}\nstable_id: mutations\n"
            "data_filename: data_mutations.txt\n"
        )
        (d / "data_mutations.txt").write_text(
            "Hugo_Symbol\tEntrez_Gene_Id\tStart_Position\t"
            "Tumor_Sample_Barcode\n" + "\n".join(rows) + "\n"
        )

    real_read = pipelines.read_maf

    def flaky_read(spark_, path):
        if "s_bb" in path:
            raise RuntimeError("injected read failure")
        return real_read(spark_, path)

    monkeypatch.setattr(pipelines, "read_maf", flaky_read)
    out = tmp_path / "mout"
    s = pipelines.convert_mutations(
        spark, str(root), str(out), max_workers=4
    )
    assert len(s.processed) == 2 and len(s.failed) == 1
    assert "s_bb" in next(iter(s.failed))
    ev_a = _read(out / "s_aa_data_mutations_mutation_event.parquet")
    ev_c = _read(out / "s_cc_data_mutations_mutation_event.parquet")
    # s_bb consumed nothing: s_cc follows s_aa directly
    assert sorted(ev_a.MUTATION_EVENT_ID) == [0]
    assert sorted(ev_c.MUTATION_EVENT_ID) == [1, 2]
    # no partial outputs for the failed study
    import os

    assert not any("s_bb" in n for n in os.listdir(out))


def _three_study_mutation_tree(tmp_path):
    """s_aa (1 row), s_bb (1 row), s_cc (2 rows) — the D4 fixture the
    read-failure tests share; s_bb is the injection target."""
    root = tmp_path / "studies"
    for name, rows in (
        ("s_aa", ["TP53\t7157\t1\tSA"]),
        ("s_bb", ["BRAF\t673\t3\tSB"]),
        ("s_cc", ["EGFR\t1956\t5\tSC", "KRAS\t3845\t9\tSC"]),
    ):
        d = root / name
        d.mkdir(parents=True)
        (d / "meta_mutations.txt").write_text(
            f"cancer_study_identifier: {name}\nstable_id: mutations\n"
            "data_filename: data_mutations.txt\n"
        )
        (d / "data_mutations.txt").write_text(
            "Hugo_Symbol\tEntrez_Gene_Id\tStart_Position\t"
            "Tumor_Sample_Barcode\n" + "\n".join(rows) + "\n"
        )
    return root


def test_convert_mutations_grouped_salvage_isolates_corrupt_file(
    spark, tmp_path, monkeypatch
):
    """Round-10 verdict #3: the grouped single-job mode is
    all-or-nothing; the salvage wrapper restores D4 per-file isolation.
    One MAF fails its read deterministically (injected at the read_maf
    seam — PERMISSIVE CSV makes content-level failures unreachable):
    the grouped run still completes every healthy file, the manifest
    names the failure, and the output converges to parity with the
    loop run over the same tree (same file set, same ids, same rows —
    the failed file consumed no ids in both)."""
    import os

    root = _three_study_mutation_tree(tmp_path)
    real_read = pipelines.read_maf

    def corrupt_read(spark_, path):
        if isinstance(path, str) and "s_bb" in path:
            raise RuntimeError("injected corruption")
        return real_read(spark_, path)

    monkeypatch.setattr(pipelines, "read_maf", corrupt_read)
    out_loop, out_salv = tmp_path / "oloop", tmp_path / "osalv"
    loop = pipelines.convert_mutations(spark, str(root), str(out_loop))
    salv = pipelines.convert_mutations_grouped_salvage(
        spark, str(root), str(out_salv)
    )
    assert not loop.ok and not salv.ok
    assert sorted(salv.processed) == sorted(loop.processed)
    assert len(salv.processed) == 2
    (bad,) = salv.failed
    assert "s_bb" in bad and "injected corruption" in salv.failed[bad]
    names = sorted(n for n in os.listdir(out_loop) if n.endswith(".parquet"))
    got = sorted(n for n in os.listdir(out_salv) if n.endswith(".parquet"))
    assert got == names and not any("s_bb" in n for n in names)
    for n in names:
        a = _read(out_loop / n)
        b = _read(out_salv / n)
        if "MUTATION_EVENT_ID" in a.columns:
            a = a.sort_values("MUTATION_EVENT_ID")
            b = b.sort_values("MUTATION_EVENT_ID")
        assert a.values.tolist() == b.values.tolist(), n


def test_convert_mutations_grouped_salvage_replays_transient_failure(
    spark, tmp_path, monkeypatch
):
    """A file that fails only its PROBE (transient) is salvaged by the
    loop-path replay: the run converges to ok, and the replayed file
    takes ids past the healthy range (documented late-id contract —
    unique and ordered, gapless within each phase)."""
    root = _three_study_mutation_tree(tmp_path)
    real_read = pipelines.read_maf
    fails = {"n": 0}

    def flaky_once(spark_, path):
        if isinstance(path, str) and "s_bb" in path and fails["n"] == 0:
            fails["n"] = 1
            raise RuntimeError("transient probe failure")
        return real_read(spark_, path)

    monkeypatch.setattr(pipelines, "read_maf", flaky_once)
    out = tmp_path / "osalv2"
    s = pipelines.convert_mutations_grouped_salvage(
        spark, str(root), str(out)
    )
    assert s.ok and len(s.processed) == 3 and not s.failed
    ev_a = _read(out / "s_aa_data_mutations_mutation_event.parquet")
    ev_b = _read(out / "s_bb_data_mutations_mutation_event.parquet")
    ev_c = _read(out / "s_cc_data_mutations_mutation_event.parquet")
    # healthy files keep loop-identical ids (s_bb's probe failure
    # consumed none); the salvaged file takes the next free range
    assert sorted(ev_a.MUTATION_EVENT_ID) == [0]
    assert sorted(ev_c.MUTATION_EVENT_ID) == [1, 2]
    assert sorted(ev_b.MUTATION_EVENT_ID) == [3]
    # the replay goes through the SHARED per-file writer, so the
    # salvaged output keeps the loop's one-part-file layout
    import glob as _glob

    parts = _glob.glob(
        str(out / "s_bb_data_mutations_mutation_event.parquet" / "*.parquet")
    )
    assert len(parts) == 1, parts


def test_convert_mutations_partitioned_matches_per_study(
    spark, study_tree, tmp_path
):
    """Single-job mutations mode: ids byte-identical to the sequential
    loop (global prefix-sum across header groups in sorted-path
    order), full row equality against the per-study convert's
    outputs, two write jobs total. Three studies where the middle one
    (sorted order) has a DIFFERENT header, so ids must interleave
    across header groups."""
    root = tmp_path / "studies_m"
    mafs = {
        # s_01 and s_03 share a header; s_02 differs (extra column and
        # different order) -> 2 header groups, ids interleave 0..5
        "s_01": (
            "Hugo_Symbol\tEntrez_Gene_Id\tStart_Position\t"
            "Tumor_Sample_Barcode\n"
            "TP53\t7157\t1\tSA\nBRCA1\t672\t2\tSA\n"
        ),
        "s_02": (
            "#v2\nTumor_Sample_Barcode\tHugo_Symbol\tEntrez_Gene_Id\t"
            "Center\tStart_Position\n"
            "SB\tEGFR\t1956\tC1\t5\nSB\tKRAS\t3845\tC1\t7\n"
        ),
        "s_03": (
            "Hugo_Symbol\tEntrez_Gene_Id\tStart_Position\t"
            "Tumor_Sample_Barcode\n"
            "ALK\t238\t9\tSC\nMYC\t4609\t11\tSC\n"
        ),
    }
    for name, body in mafs.items():
        d = root / name
        d.mkdir(parents=True)
        (d / "meta_mutations.txt").write_text(
            f"cancer_study_identifier: {name}\nstable_id: mutations\n"
            "data_filename: data_mutations.txt\n"
        )
        (d / "data_mutations.txt").write_text(body)

    per_study = tmp_path / "per_study_m"
    single_job = tmp_path / "single_job_m"
    pipelines.convert_mutations(spark, str(root), str(per_study))
    n = pipelines.convert_mutations_partitioned(
        spark, str(root), str(single_job)
    )
    assert n == 3

    def rows(q):
        return sorted(map(tuple, duckdb.sql(q).fetchall()))

    ev_cols = "MUTATION_EVENT_ID, ENTREZ_GENE_ID, START_POSITION"
    a = rows(
        f"select {ev_cols} from read_parquet("
        f"'{per_study}/*_mutation_event.parquet/*.parquet')"
    )
    b = rows(
        f"select {ev_cols} from read_parquet("
        f"'{single_job}/mutation_event.parquet/*.parquet')"
    )
    assert a == b and len(a) == 6
    # ids dense and gapless corpus-wide, interleaving the header groups
    assert [r[0] for r in b] == list(range(6))
    # sorted-path order: s_02's rows (the other header group) sit at
    # ids 2-3, BETWEEN the same-group files s_01 and s_03
    by_id = {r[0]: r[1] for r in b}
    assert by_id[2] == "1956" and by_id[3] == "3845"

    m_cols = "MUTATION_EVENT_ID, GENETIC_PROFILE_ID, SAMPLE_ID"
    ma = rows(
        f"select {m_cols} from read_parquet("
        f"'{per_study}/*_mutation.parquet/*.parquet')"
    )
    mb = rows(
        f"select {m_cols} from read_parquet("
        f"'{single_job}/mutation.parquet/*/*.parquet', "
        f"hive_partitioning=true)"
    )
    assert ma == mb and len(ma) == 6


def test_convert_mutations_partitioned_exotic_names_via_symlink(
    spark, tmp_path
):
    """ADVICE r9: two correctness traps in the single-job manifest/id
    plumbing, both exercised at once.

    (1) File URI percent-encoding can permute id order vs the
    sequential loop's raw-path discovery order: 'x>y' scans as
    'x%3Ey' and '%'(0x25) < '0'(0x30), so lexicographic-URI ordering
    puts 'x>y.txt' BEFORE 'x0y.txt' while raw-path order is the
    reverse — ids must follow discovery order (URI->rank map).

    (2) Manifest keys built with Path.resolve() resolve symlinks but
    input_file_name() does not (verified empirically), so a symlinked
    tsv_dir made every scan tag miss the broadcast manifest.
    """
    import os

    real_root = tmp_path / "real_studies"
    d = real_root / "s_exotic"
    d.mkdir(parents=True)
    hdr = (
        "Hugo_Symbol\tEntrez_Gene_Id\tStart_Position\t"
        "Tumor_Sample_Barcode\n"
    )
    # raw-path sorted (= discovery = sequential) order:
    #   data_mutations_x0y.txt  then  data_mutations_x>y.txt
    # lexicographic scan-URI order is the reverse.
    (d / "meta_mutations_a.txt").write_text(
        "cancer_study_identifier: s_exotic\nstable_id: mutations\n"
        "data_filename: data_mutations_x0y.txt\n"
    )
    (d / "data_mutations_x0y.txt").write_text(
        hdr + "TP53\t7157\t1\tSA\nBRCA1\t672\t2\tSA\n"
    )
    (d / "meta_mutations_b.txt").write_text(
        "cancer_study_identifier: s_exotic\nstable_id: mutations2\n"
        "data_filename: data_mutations_x>y.txt\n"
    )
    (d / "data_mutations_x>y.txt").write_text(
        hdr + "EGFR\t1956\t5\tSB\nKRAS\t3845\t7\tSB\n"
    )
    link = tmp_path / "linked_studies"
    os.symlink(real_root, link)

    per_study = tmp_path / "per_study_x"
    single_job = tmp_path / "single_job_x"
    summary = pipelines.convert_mutations(spark, str(link), str(per_study))
    assert summary.ok
    n = pipelines.convert_mutations_partitioned(
        spark, str(link), str(single_job)
    )
    assert n == 2

    def rows(q):
        return sorted(map(tuple, duckdb.sql(q).fetchall()))

    cols = "MUTATION_EVENT_ID, ENTREZ_GENE_ID, START_POSITION"
    a = rows(
        f"select {cols} from read_parquet("
        f"'{per_study}/*_mutation_event.parquet/*.parquet')"
    )
    b = rows(
        f"select {cols} from read_parquet("
        f"'{single_job}/mutation_event.parquet/*.parquet')"
    )
    assert a == b and len(a) == 4
    # discovery (raw-path) order: x0y's rows take ids 0-1, x>y's 2-3 —
    # lexicographic-URI ordering would have flipped them
    by_id = {r[0]: r[1] for r in b}
    assert by_id[0] == "7157" and by_id[2] == "1956"


def test_convert_cna_partitioned_quote_guard(spark, tmp_path):
    """ADVICE r9: the single-job CNA mode parses rows with a raw
    split(value, '\\t') — no csv quote semantics — so a data cell
    containing '\"' must fail LOUD (the per-study csv mode applies
    default quote handling and would diverge silently)."""
    root = tmp_path / "studies_q"
    d = root / "s_q"
    d.mkdir(parents=True)
    (d / "meta_cna.txt").write_text(
        "cancer_study_identifier: s_q\nstable_id: gistic\n"
        "data_filename: data_cna.txt\n"
    )
    (d / "data_cna.txt").write_text(
        'Hugo_Symbol\tEntrez_Gene_Id\tS1\nTP53\t7157\t"0"\n'
    )
    with pytest.raises(ValueError, match="quote"):
        pipelines.convert_cna_partitioned(
            spark, str(root), str(tmp_path / "out_q")
        )


def test_convert_mutations_grouped_matches_loop_layout(spark, tmp_path):
    """Round-9 verdict #2: the grouped single-job mode must reproduce
    the per-study loop's OUTPUT LAYOUT exactly — same file names, same
    rows per file, identical ids, one part file per output — while
    running one write job per table instead of ~12 stages per file.
    Includes a zero-data-row MAF (schema-only output both modes) and
    two header groups (ids interleave)."""
    import glob
    import os

    root = tmp_path / "studies_g"
    mafs = {
        "g_01": (
            "Hugo_Symbol\tEntrez_Gene_Id\tStart_Position\t"
            "Tumor_Sample_Barcode\n"
            "TP53\t7157\t1\tSA\nBRCA1\t672\t2\tSA\n"
        ),
        # different header -> second scan group
        "g_02": (
            "#v2\nTumor_Sample_Barcode\tHugo_Symbol\tEntrez_Gene_Id\t"
            "Center\tStart_Position\n"
            "SB\tEGFR\t1956\tC1\t5\n"
        ),
        # header only, zero data rows
        "g_03": (
            "Hugo_Symbol\tEntrez_Gene_Id\tStart_Position\t"
            "Tumor_Sample_Barcode\n"
        ),
        "g_04": (
            "Hugo_Symbol\tEntrez_Gene_Id\tStart_Position\t"
            "Tumor_Sample_Barcode\n"
            "ALK\t238\t9\tSC\n"
        ),
    }
    for name, body in mafs.items():
        d = root / name
        d.mkdir(parents=True)
        (d / "meta_mutations.txt").write_text(
            f"cancer_study_identifier: {name}\nstable_id: mutations\n"
            "data_filename: data_mutations.txt\n"
        )
        (d / "data_mutations.txt").write_text(body)

    loop_out = tmp_path / "loop_g"
    grouped_out = tmp_path / "grouped_g"
    assert pipelines.convert_mutations(spark, str(root), str(loop_out)).ok
    n = pipelines.convert_mutations_grouped(
        spark, str(root), str(grouped_out)
    )
    assert n == 4
    assert not (grouped_out / ".grouped_staging").exists()

    loop_files = sorted(os.listdir(loop_out))
    grouped_files = sorted(
        f for f in os.listdir(grouped_out) if not f.startswith(".")
    )
    assert loop_files == grouped_files  # identical output layout

    for fname in loop_files:
        parts = glob.glob(str(grouped_out / fname / "*.parquet"))
        assert len(parts) == 1, f"{fname}: expected 1 part file"
        a = duckdb.sql(
            f"select * from read_parquet('{loop_out / fname}/*.parquet')"
        ).df()
        b = duckdb.sql(
            f"select * from read_parquet('{grouped_out / fname}/*.parquet')"
        ).df()
        assert list(a.columns) == list(b.columns), fname
        sa = sorted(map(tuple, a.itertuples(index=False)))
        sb = sorted(map(tuple, b.itertuples(index=False)))
        assert sa == sb, fname
    # corpus-wide id check: dense, gapless, discovery order
    ids = sorted(
        duckdb.sql(
            f"select MUTATION_EVENT_ID from read_parquet("
            f"'{grouped_out}/*_mutation_event.parquet/*.parquet')"
        ).df()["MUTATION_EVENT_ID"]
    )
    assert ids == [0, 1, 2, 3]


def test_convert_cna_grouped_matches_loop_layout(spark, study_tree, tmp_path):
    """CNA twin of the grouped-mode parity pin: identical output
    layout and rows to the per-study loop, one part file per
    Spark-written output, genetic_profile_samples written driver-side
    (pyarrow) with its 1-row invariant intact."""
    import glob
    import os

    loop_out = tmp_path / "loop_c"
    grouped_out = tmp_path / "grouped_c"
    assert pipelines.convert_cna(
        spark, str(study_tree), str(loop_out), with_derived=True
    ).ok
    n = pipelines.convert_cna_grouped(
        spark, str(study_tree), str(grouped_out), with_derived=True
    )
    assert n == 2
    loop_files = sorted(os.listdir(loop_out))
    grouped_files = sorted(
        f for f in os.listdir(grouped_out) if not f.startswith(".")
    )
    assert loop_files == grouped_files
    for fname in loop_files:
        a = duckdb.sql(
            f"select * from read_parquet('{loop_out / fname}/*.parquet')"
        ).df()
        b = duckdb.sql(
            f"select * from read_parquet('{grouped_out / fname}/*.parquet')"
        ).df()
        assert list(a.columns) == list(b.columns), fname
        assert sorted(map(tuple, a.itertuples(index=False))) == sorted(
            map(tuple, b.itertuples(index=False))
        ), fname
        if "genetic_alterations" in fname or "derived" in fname:
            parts = glob.glob(str(grouped_out / fname / "*.parquet"))
            assert len(parts) == 1, fname
    gps = duckdb.sql(
        "select * from read_parquet("
        f"'{grouped_out}/study_a_data_cna_genetic_profile_samples"
        ".parquet/*.parquet')"
    ).df()
    assert len(gps) == 1  # 1-row invariant (cna/transformer.go:553-560)
    assert gps.ORDERED_SAMPLE_LIST[0] == "study_a_S1,study_a_S2,study_a_S3"
