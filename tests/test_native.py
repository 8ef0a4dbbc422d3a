"""Native fastcsv parser: build, correctness vs pandas, fallbacks."""

import numpy as np
import pandas as pd
import pytest

from mgr_tpu.data import fastcsv


@pytest.fixture()
def csv_file(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(50, 7)).astype(np.float32)
    path = tmp_path / "x.csv"
    header = ",".join(f"c{i}" for i in range(7))
    np.savetxt(path, data, delimiter=",", header=header, comments="",
               fmt="%.6f")
    return str(path), data


def test_native_build_and_parse(csv_file):
    path, data = csv_file
    if not fastcsv.available():
        pytest.skip("no g++ toolchain in this environment")
    out = fastcsv.load_numeric_csv(path, skip_header=True)
    assert out.shape == data.shape
    np.testing.assert_allclose(out, data, rtol=1e-5, atol=1e-6)


def test_matches_pandas(csv_file):
    path, _ = csv_file
    out = fastcsv.load_numeric_csv(path, skip_header=True)
    want = pd.read_csv(path).to_numpy(dtype=np.float32)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_negative_and_scientific_notation(tmp_path):
    path = tmp_path / "sci.csv"
    path.write_text("a,b\n-1.5e-3,2E+2\n0.25,-7\n")
    out = fastcsv.load_numeric_csv(str(path), skip_header=True)
    np.testing.assert_allclose(
        out, [[-0.0015, 200.0], [0.25, -7.0]], rtol=1e-6
    )


def test_no_header_mode(tmp_path):
    path = tmp_path / "nh.csv"
    path.write_text("1,2\n3,4\n")
    out = fastcsv.load_numeric_csv(str(path), skip_header=False)
    np.testing.assert_array_equal(out, [[1, 2], [3, 4]])


def test_numpy_fallback_matches(csv_file, monkeypatch):
    path, data = csv_file
    monkeypatch.setattr(fastcsv, "_load", lambda: None)
    out = fastcsv.load_numeric_csv(path, skip_header=True)
    np.testing.assert_allclose(out, data, rtol=1e-5, atol=1e-6)


def test_audio_loader_uses_native_path(tmp_path):
    # End-to-end through formats.load_audio_file_csv with a file_number col.
    from mgr_tpu.data import formats

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(10, 39)).astype(np.float32)
    rows = np.concatenate([feats, np.full((10, 1), 3.0)], axis=1)
    header = ",".join(str(i) for i in range(39)) + ",file_number"
    path = tmp_path / "audio_3.csv"
    np.savetxt(path, rows, delimiter=",", header=header, comments="",
               fmt="%.6f")
    out = formats.load_audio_file_csv(str(path))
    np.testing.assert_allclose(out, feats, rtol=1e-5, atol=1e-5)
