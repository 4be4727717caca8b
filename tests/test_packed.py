"""Packed (decode-free) dataset: byte-identical samples vs the file-based
pipeline given the same RNG stream."""

import numpy as np
import pytest

from hcmoco_tpu.data.fixtures import make_ntu_fixture, make_mpii_fixture
from hcmoco_tpu.data.ntu import NTUSkeleton3D
from hcmoco_tpu.data.packed import pack_ntu, PackedNTUSkeleton
from hcmoco_tpu.data.combined import NTUMPIIGCN


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ntu"))
    root, lst = make_ntu_fixture(root, n_frames=4)
    out = str(tmp_path_factory.mktemp("pack"))
    meta = pack_ntu(root, lst, out)
    return root, lst, out, meta


class TestPack:
    def test_meta(self, packed):
        root, lst, out, meta = packed
        assert meta["n"] == 4
        assert meta["h"] == 96 and meta["w"] == 128

    def test_samples_identical_to_file_pipeline(self, packed):
        root, lst, out, _ = packed
        a = NTUSkeleton3D(root, lst, size=32, random_flip=True,
                          random_resized_crop=True, seed=5)
        b = PackedNTUSkeleton(out, size=32, random_flip=True,
                              random_resized_crop=True, seed=5)
        for i in range(4):
            ra, ja, _, pa = a.load_raw(i)
            rb, jb, _, pb = b.load_raw(i)
            assert pa == pb  # identical crop decisions
            np.testing.assert_allclose(ra, rb, atol=1e-6)
            np.testing.assert_allclose(ja, jb, atol=1e-6)

    def test_combined_dataset_on_pack(self, packed, tmp_path_factory):
        root, lst, out, _ = packed
        mpii = make_mpii_fixture(str(tmp_path_factory.mktemp("mpii")))
        packed_ntu = PackedNTUSkeleton(out, size=32,
                                       random_resized_crop=True)
        ds = NTUMPIIGCN(root, lst, mpii, "train", size=32,
                        random_resized_crop=True, ntu_dataset=packed_ntu)
        s = ds[len(ds.db)]  # NTU sample through the pack
        assert s["rgbd"].shape == (32, 32, 6)
        assert int(s["use_depth"]) == 1


def test_slot_writer_path_matches_collate(packed):
    """DataSource's getitem_into slot path (native resample writes batch
    rows in place, zero collate copies) must produce byte-identical batches
    to the submit-collate path with the same seed (num_workers=1 pins the
    per-sample RNG consumption order in both)."""
    from hcmoco_tpu.data.pipeline import DataSource

    _, _, pack, meta = packed
    n = meta["n"]
    ds_a = PackedNTUSkeleton(pack, size=32, random_flip=True,
                             random_resized_crop=True, seed=7,
                             raw_output=True)
    ds_b = PackedNTUSkeleton(pack, size=32, random_flip=True,
                             random_resized_crop=True, seed=7,
                             raw_output=True)
    ds_b.getitem_into = None  # force the legacy submit-collate path
    it_a = iter(DataSource(ds_a, 4, np.ones(n), seed=3, num_workers=1))
    it_b = iter(DataSource(ds_b, 4, np.ones(n), seed=3, num_workers=1))
    for _ in range(3):
        ba, bb = next(it_a), next(it_b)
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])
            assert ba[k].dtype == bb[k].dtype


def test_raw_output_matches_host_normalize(packed):
    """Device-side normalization of the raw uint8/uint16 pipeline output
    must reproduce the host-normalized f32 rgbd exactly (same crop, same
    math: contrast_step.device_normalize vs transforms.normalize_rgb)."""
    import jax.numpy as jnp
    from hcmoco_tpu.train.contrast_step import device_normalize

    _, _, pack, _ = packed
    ds_f32 = PackedNTUSkeleton(str(pack), size=64, random_flip=True,
                               random_resized_crop=True, seed=7)
    ds_raw = PackedNTUSkeleton(str(pack), size=64, random_flip=True,
                               random_resized_crop=True, seed=7,
                               raw_output=True)
    a = ds_f32[3]
    b = ds_raw[3]
    assert set(b) >= {"rgb_u8", "depth_mm", "index"}
    assert b["rgb_u8"].dtype == np.uint8
    assert b["depth_mm"].dtype == np.uint16
    got = np.asarray(device_normalize(
        {k: jnp.asarray(v[None]) for k, v in b.items()})["rgbd"][0])
    np.testing.assert_allclose(got, a["rgbd"], rtol=1e-6, atol=1e-6)
