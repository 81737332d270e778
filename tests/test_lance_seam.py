"""The Lance read seam (input_hint's production format; wheel absent in
this sandbox — the real-read test auto-skips, mirroring the codec-adapter
tests)."""

import pyarrow as pa
import pytest

from text_dedup_ray.sources.io import HAS_LANCE, read_table


def test_lance_absent_raises_cleanly():
    if HAS_LANCE:
        pytest.skip("lance wheel present; covered by test_lance_roundtrip")
    with pytest.raises(NotImplementedError, match="lance is not installed"):
        read_table("/tmp/whatever.lance", fmt="lance")


def test_lance_roundtrip(tmp_path, ray_session):
    lance = pytest.importorskip("lance")  # wheel absent in this sandbox
    t = pa.table(
        {
            "image_id": pa.array(["img-000000000000", "img-000000000001"]),
            "caption": pa.array(["a b c", "d e f"]),
        }
    )
    uri = str(tmp_path / "docs.lance")
    lance.write_dataset(t, uri)
    ds = read_table(uri, columns=["image_id", "caption"], fmt="lance")
    got = ds.take_all()
    assert sorted(r["image_id"] for r in got) == t["image_id"].to_pylist()
