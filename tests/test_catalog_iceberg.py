"""Execution coverage for the Iceberg branch of logagg.catalog.

The sandbox ships no Iceberg runtime jar, so every integration test runs
the parquet fallback; this file covers the other branch by asserting the
exact ``writeTo``/``partitionedBy``/``createOrReplace``/``append``/
``spark.read.table`` call sequences against mocks, so a refactor cannot
silently break the production (Iceberg) code path. The codec probe test
plays the same role for the multimodal stub kernel.
"""

from unittest import mock

from logagg.catalog import Catalog


def _iceberg_catalog(tmp_path):
    fake_spark = mock.MagicMock(name="spark")
    with mock.patch("logagg.catalog.iceberg_available", return_value=True):
        cat = Catalog(fake_spark, tmp_path)
    assert cat.iceberg
    return fake_spark, cat


def test_overwrite_partitioned_drives_writeTo_chain(spark, tmp_path):
    # the real `spark` fixture is needed only so F.col() has a JVM; the
    # catalog itself talks to the mocked session/DataFrame
    _, cat = _iceberg_catalog(tmp_path)
    df = mock.MagicMock(name="df")
    cat.overwrite("db.t", df, partition_by=("node", "log_type"))
    df.writeTo.assert_called_once_with("db.t")
    writer = df.writeTo.return_value
    assert writer.partitionedBy.call_count == 1
    assert len(writer.partitionedBy.call_args.args) == 2  # one Column per key
    writer.partitionedBy.return_value.createOrReplace.assert_called_once_with()
    df.write.mode.assert_not_called()  # parquet fallback must not run


def test_overwrite_unpartitioned_skips_partitionedBy(tmp_path):
    _, cat = _iceberg_catalog(tmp_path)
    df = mock.MagicMock(name="df")
    cat.overwrite("db.t", df)
    df.writeTo.assert_called_once_with("db.t")
    df.writeTo.return_value.partitionedBy.assert_not_called()
    df.writeTo.return_value.createOrReplace.assert_called_once_with()


def test_append_uses_writeTo_append(tmp_path):
    _, cat = _iceberg_catalog(tmp_path)
    df = mock.MagicMock(name="df")
    cat.append("db.t", df)
    df.writeTo.assert_called_once_with("db.t")
    df.writeTo.return_value.append.assert_called_once_with()
    df.write.mode.assert_not_called()


def test_read_and_exists_go_through_the_catalog(tmp_path):
    fake_spark, cat = _iceberg_catalog(tmp_path)
    cat.read("db.t")
    fake_spark.read.table.assert_called_once_with("db.t")
    cat.exists("db.t")
    fake_spark.catalog.tableExists.assert_called_once_with("db.t")


def test_media_codec_probe_documents_absence():
    """The multimodal decode kernel is a stub ONLY while no codec exists in
    the runtime. If PIL ever appears here, this fails loudly — the signal
    to wire the real decode into _decode_batches (same plan)."""
    from logagg import multimodal

    assert multimodal.REAL_CODECS_AVAILABLE is False
