"""Streaming curation (streaming.run_streaming_curate): per-micro-batch
incremental curation must equal sequential curate_increment calls on the
same batches, land exactly-once output, and replay/recover idempotently."""

from pathlib import Path

from logagg import curate
from logagg import streaming as st


def _body(tag: str) -> str:
    return " ".join(f"{tag}{i}" for i in range(60))


BATCHES = [
    [
        (1, _body("a")),
        (2, _body("b")),
        (3, _body("a")),  # exact dup of 1 (within batch)
        (4, _body("c")),
        (5, _body("c") + " extra"),  # near dup of 4 (within batch)
        (6, _body("d")),
    ],
    [
        (11, _body("a")),  # exact dup of accepted 1 (cross-batch)
        (12, _body("e")),
        (13, _body("c") + " extraz"),  # near dup of accepted 4 (cross-batch)
        (14, _body("e")),  # exact dup of 12 (within batch)
        (15, _body("f")),
    ],
    [
        (21, _body("e")),  # exact dup of accepted 12
        (22, _body("c") + " morex"),  # near dup of accepted 4
        (23, _body("g")),  # fresh
    ],
    [
        (31, _body("a")),  # every doc a dup → EMPTY survivors batch
        (32, _body("e")),
    ],
]


def _stage_stream(spark, root: Path) -> str:
    src = root / "docs_stream"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
            str(src / f"part{i}"), mode="overwrite"
        )
    return f"{src}/part*"


def _out_ids(spark, outdir: str, batch_id: int) -> list[int]:
    p = Path(f"{outdir}/batch_id={batch_id}")
    df = spark.read.schema("doc_id long, text string").parquet(str(p))
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_streaming_curate_exactly_once_and_equal_to_sequential(spark, tmp_path):
    glob = _stage_stream(spark, tmp_path)
    state = str(tmp_path / "state")
    outdir = str(tmp_path / "out")

    counts = st.run_streaming_curate(
        spark, glob, state, outdir, str(tmp_path / "ckpt1"),
        near_dedup=True, max_files_per_trigger=1,
    )
    assert sorted(counts) == [0, 1, 2, 3]
    assert all(not c["recovered"] for c in counts.values())

    # sequential twin: curate_increment per batch against its own state
    seq_state = str(tmp_path / "seq_state")
    seq_corpus = None
    seq_ids = []
    for rows in BATCHES:
        b = spark.createDataFrame(rows, "doc_id long, text string")
        res = curate.curate_increment(
            b, seq_state, corpus=seq_corpus, near_dedup=True
        )
        seq_ids.append(sorted(r["doc_id"] for r in res.docs.select("doc_id").collect()))
        seq_corpus = res.docs if seq_corpus is None else seq_corpus.unionByName(res.docs)

    assert seq_ids == [[1, 2, 4, 6], [12, 15], [23], []]
    for bid in range(4):
        assert _out_ids(spark, outdir, bid) == seq_ids[bid], bid
        assert counts[bid]["n"] == len(seq_ids[bid])
        stages = [m["stage"] for m in counts[bid]["manifest"]]
        assert "exact_dedup_incremental" in stages and "near_dedup_incremental" in stages

    # state invariants: md5 set is duplicate-free (anti-join commit) and
    # the band index covers exactly the surviving docs
    md5 = spark.read.parquet(f"{state}/md5")
    assert md5.count() == md5.distinct().count()
    bands = spark.read.parquet(f"{state}/minhash/bands")
    indexed = sorted(int(r["id"]) for r in bands.select("id").distinct().collect())
    assert indexed == sorted(i for ids in seq_ids for i in ids)

    # ---- replay from scratch: fresh checkpoint restarts batch ids at 0;
    # every batch must be skipped by its marker, output and state untouched
    md5_before = md5.count()
    counts2 = st.run_streaming_curate(
        spark, glob, state, outdir, str(tmp_path / "ckpt2"),
        near_dedup=True, max_files_per_trigger=1,
    )
    assert {k: v["n"] for k, v in counts2.items()} == {
        k: v["n"] for k, v in counts.items()
    }
    for bid in range(4):
        assert _out_ids(spark, outdir, bid) == seq_ids[bid]
    assert spark.read.parquet(f"{state}/md5").count() == md5_before
    assert spark.read.parquet(f"{state}/minhash/bands").count() == bands.count()

    # ---- half-commit recovery: lose a marker (crash after landing,
    # before/through the state fold) → re-commit from the landed output,
    # never re-probe; state stays duplicate-free
    (Path(state) / "_batch_ledger" / "batch-1.json").unlink()
    counts3 = st.run_streaming_curate(
        spark, glob, state, outdir, str(tmp_path / "ckpt3"),
        near_dedup=True, max_files_per_trigger=1,
    )
    assert counts3[1]["recovered"] and counts3[1]["n"] == len(seq_ids[1])
    assert _out_ids(spark, outdir, 1) == seq_ids[1]
    m = spark.read.parquet(f"{state}/md5")
    assert m.count() == md5_before and m.count() == m.distinct().count()
    assert spark.read.parquet(f"{state}/minhash/bands").count() == bands.count()


def test_streaming_curate_exact_only_and_filters_pass_through(spark, tmp_path):
    src = tmp_path / "docs2"
    src.mkdir()
    rows0 = [(1, _body("a")), (2, "tiny"), (3, _body("a"))]
    rows1 = [(11, _body("a")), (12, _body("b"))]
    for i, rows in enumerate((rows0, rows1)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
            str(src / f"part{i}"), mode="overwrite"
        )
    counts = st.run_streaming_curate(
        spark, f"{src}/part*", str(tmp_path / "st2"), str(tmp_path / "out2"),
        str(tmp_path / "ck2"), near_dedup=False, max_files_per_trigger=1,
        quality_min=0.2,  # stateless filter kwarg passes through to curate
    )
    # doc 2 fails quality, doc 3 exact-dups 1; doc 11 exact-dups accepted 1
    assert counts[0]["n"] == 1 and counts[1]["n"] == 1
    assert [m["stage"] for m in counts[0]["manifest"]][0] == "quality_filter"
    ids0 = _out_ids(spark, str(tmp_path / "out2"), 0)
    ids1 = _out_ids(spark, str(tmp_path / "out2"), 1)
    assert ids0 == [1] and ids1 == [12]
    assert not Path(tmp_path / "st2" / "minhash").exists()
