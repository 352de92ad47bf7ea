"""I/O tests against real reference assets (HDR, PNG, GEM)."""
import numpy as np
import pytest

from conftest import ref_path
from raytracingrenderer_tpu.io.hdr import read_hdr, write_hdr
from raytracingrenderer_tpu.io.png import read_png_float, write_png, read_png
from raytracingrenderer_tpu.scene.gem import load_gem


class TestHdr:
    def test_read_reference_render(self):
        img = read_hdr(ref_path("result_144.hdr"))
        assert img.shape == (1024, 1024, 3)
        assert img.dtype == np.float32
        assert 0.05 < img.mean() < 1.0
        assert img.max() > 10.0  # emitter visible

    def test_read_envmap(self):
        img = read_hdr(ref_path("1.hdr"))
        assert img.shape == (1024, 1024, 3)

    def test_roundtrip_exact(self, tmp_path):
        img = read_hdr(ref_path("result_44.hdr"))
        p = str(tmp_path / "x.hdr")
        write_hdr(p, img)
        np.testing.assert_array_equal(read_hdr(p), img)

    def test_roundtrip_synthetic(self, tmp_path):
        rng = np.random.default_rng(0)
        img = (rng.random((17, 33, 3)) * 100).astype(np.float32)
        p = str(tmp_path / "y.hdr")
        write_hdr(p, img)
        got = read_hdr(p)
        # RGBE quantizes all three channels on the max channel's exponent
        # with a truncating 8-bit mantissa in [128,256): worst-case error
        # is maxchannel/128 per pixel, not a per-channel rtol.
        bound = img.max(axis=-1, keepdims=True) / 128.0 + 1e-4
        assert (np.abs(got - img) <= bound).all()


class TestPng:
    def test_constant_color_textures(self):
        p = read_png_float(ref_path("cornell-box", "0.725_0.71_0.68_1.0.png"))
        np.testing.assert_allclose(p[..., :3].reshape(-1, 3).mean(0),
                                   [0.7215686, 0.7098039, 0.6784314],
                                   atol=1e-3)
        assert p[..., :3].std(axis=(0, 1)).max() < 1e-6  # spatially const

    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (20, 31, 3), dtype=np.uint8)
        p = str(tmp_path / "x.png")
        write_png(p, img)
        np.testing.assert_array_equal(read_png(p), img)


class TestGem:
    def test_cornell_box_counts(self):
        # SURVEY §2.8: cornell-box totals 36 triangles
        # (5 rect walls*2 + light rect*2 + 2 cubes*12)
        rect = load_gem(ref_path("cornell-box", "Rectangle.gem"))
        cube = load_gem(ref_path("cornell-box", "Cube.gem"))
        assert sum(len(m.indices) // 3 for m in rect) == 2
        assert sum(len(m.indices) // 3 for m in cube) == 12

    def test_vertex_attributes(self):
        m = load_gem(ref_path("cornell-box", "Rectangle.gem"))[0]
        assert m.positions.shape == (6, 3)
        assert m.normals.shape == (6, 3)
        assert m.uvs.shape == (6, 2)
        # unit rectangle in xy plane
        np.testing.assert_allclose(np.abs(m.positions[:, :2]).max(), 1.0)
        np.testing.assert_allclose(
            np.linalg.norm(m.normals, axis=1), 1.0, atol=1e-5)

    def test_materials_scene_counts(self):
        # SURVEY §2.8: MaterialsScene ~5.8k triangles over 7 instances
        total = 0
        for i in range(7):
            for m in load_gem(ref_path("MaterialsScene", f"{i}.gem")):
                total += len(m.indices) // 3
        assert 5000 < total < 7000
