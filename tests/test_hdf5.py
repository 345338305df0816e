"""HDF5 source goldens (reference src/capture-api.jl:587-635 @h5read;
test/source_test.jl-shaped): write a classic-subset file with the
pure-python codec, read it back distributed via row-range splits, and
check values byte-exactly. Also pins the format structures themselves
(signature, superblock fields, symbol-table walk) so a regression in
the writer can't silently pair with a compensating reader bug.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hpat_jl_spark.sources import hdf5 as H


@pytest.fixture(scope="module")
def h5file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("h5") / "golden.h5")
    rng = np.random.default_rng(42)
    data = {
        "points": rng.standard_normal((1000, 3)).astype("<f8"),
        "responses": np.arange(1000, dtype="<i8") * 7 - 3,
        "weights": rng.random(1000).astype("<f4"),
        "labels": (np.arange(1000) % 5).astype("<i4"),
    }
    H.write_hdf5(path, data)
    return path, data


def test_file_signature_and_superblock(h5file):
    path, _ = h5file
    buf = open(path, "rb").read()
    assert buf[:8] == b"\x89HDF\r\n\x1a\n"
    assert buf[8] == 0  # classic superblock v0
    assert buf[13] == 8 and buf[14] == 8  # 8-byte offsets/lengths
    eof = struct.unpack_from("<Q", buf, 40)[0]
    assert eof == len(buf)  # EOF address is exact


def test_scan_finds_all_datasets_with_exact_metadata(h5file):
    path, data = h5file
    meta = H.scan_hdf5(path)
    assert sorted(meta) == sorted(data)
    for name, arr in data.items():
        assert meta[name].shape == arr.shape
        assert meta[name].dtype == arr.dtype


def test_roundtrip_2d_float64(spark, h5file):
    path, data = h5file
    df = H.read_hdf5(spark, path, "points", num_splits=7)
    pdf = df.toPandas().sort_values("row_id", ignore_index=True)
    assert list(pdf.columns) == ["row_id", "c0", "c1", "c2"]
    got = pdf[["c0", "c1", "c2"]].to_numpy()
    np.testing.assert_array_equal(got, data["points"])  # bit-exact


def test_roundtrip_1d_int64_and_narrow_types(spark, h5file):
    path, data = h5file
    for name in ("responses", "weights", "labels"):
        pdf = (
            H.read_hdf5(spark, path, name, num_splits=4)
            .toPandas()
            .sort_values("row_id", ignore_index=True)
        )
        np.testing.assert_array_equal(pdf["value"].to_numpy(), data[name])


def test_split_ranges_partition_the_rows(spark, h5file):
    path, _ = h5file
    df = H.read_hdf5(spark, path, "responses", num_splits=13)
    ids = sorted(r.row_id for r in df.select("row_id").collect())
    assert ids == list(range(1000))  # no overlap, no gap across splits


def test_unknown_dataset_raises_with_listing(spark, h5file):
    path, _ = h5file
    with pytest.raises(KeyError, match="points"):
        H.read_hdf5(spark, path, "nope")


def test_non_hdf5_file_rejected(tmp_path):
    p = tmp_path / "junk.h5"
    p.write_bytes(b"parquet-pretending-to-be-hdf5")
    with pytest.raises(ValueError, match="not an HDF5 file"):
        H.scan_hdf5(str(p))


def test_writer_rejects_out_of_subset_inputs(tmp_path):
    with pytest.raises(TypeError, match="unsupported dtype"):
        H.write_hdf5(str(tmp_path / "x.h5"), {"s": np.array(["a", "b"])})
    with pytest.raises(ValueError, match="1-D/2-D"):
        H.write_hdf5(str(tmp_path / "y.h5"), {"t": np.zeros((2, 2, 2))})


def test_logreg_flagship_via_hdf5_input(spark, tmp_path):
    """Reference flagship end-to-end (README.md:46-87 +
    examples/logistic_regression.jl): synthesize → write /points +
    /responses HDF5 → distributed read → index-aligned join → train.
    The separable synthetic data forces all-positive coefficients."""
    from examples.logistic_regression import train_from_hdf5, write_training_hdf5

    path = str(tmp_path / "train.h5")
    write_training_hdf5(spark, path, n=3000, d=4)
    coefs, intercept = train_from_hdf5(spark, path, max_iter=15)
    assert len(coefs) == 4
    assert all(c > 0 for c in coefs)  # label = sum(features) > d/2


def test_aligned_table_read_matches_per_dataset_reads(spark, h5file):
    """read_hdf5_table: one split plan, each task reading the same row
    range of every dataset — must equal the per-dataset reads joined on
    row_id, bit-exactly, including mixed dtypes."""
    path, data = h5file
    t = H.read_hdf5_table(
        spark, path, ["responses", "weights", "labels"], num_splits=5
    )
    pdf = t.toPandas().sort_values("row_id", ignore_index=True)
    assert list(pdf.columns) == ["row_id", "responses", "weights", "labels"]
    np.testing.assert_array_equal(pdf["responses"].to_numpy(), data["responses"])
    np.testing.assert_array_equal(pdf["weights"].to_numpy(), data["weights"])
    np.testing.assert_array_equal(pdf["labels"].to_numpy(), data["labels"])


def test_aligned_table_read_expands_2d_and_rejects_unknown(spark, h5file):
    """A 2-D dataset contributes <name>_c0..ck columns, aligned with
    the 1-D datasets in the same pass — the @h5read matrix pattern."""
    path, data = h5file
    t = H.read_hdf5_table(spark, path, ["points", "responses"], num_splits=3)
    pdf = t.toPandas().sort_values("row_id", ignore_index=True)
    assert list(pdf.columns) == [
        "row_id", "points_c0", "points_c1", "points_c2", "responses"
    ]
    got = pdf[["points_c0", "points_c1", "points_c2"]].to_numpy()
    np.testing.assert_array_equal(got, data["points"])
    np.testing.assert_array_equal(pdf["responses"].to_numpy(), data["responses"])
    with pytest.raises(KeyError, match="nope"):
        H.read_hdf5_table(spark, path, ["responses", "nope"])
