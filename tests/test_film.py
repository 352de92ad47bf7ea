"""Film accumulation / splat / tonemap / checkpoint tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingrenderer_tpu.imaging import film as film_mod
from raytracingrenderer_tpu.utils.checkpoint import load_film, save_film


class TestFilm:
    def test_accumulate_and_hdr(self):
        f = film_mod.new_film(4, 6)
        img = jnp.ones((4, 6, 3)) * 2.0
        f = film_mod.add_sample_image(f, img)
        f = film_mod.add_sample_image(f, img * 2.0)
        out = np.asarray(film_mod.to_hdr(f))
        np.testing.assert_allclose(out, 3.0)  # (2+4)/2

    def test_tonemap_gamma(self):
        f = film_mod.new_film(1, 1)
        f = film_mod.add_sample_image(f, jnp.full((1, 1, 3), 0.5))
        out = float(np.asarray(film_mod.tonemap(f))[0, 0, 0])
        assert out == pytest.approx(0.5 ** (1 / 2.2), abs=1e-5)

    def test_splat_box(self):
        f = film_mod.new_film(8, 8)
        x = jnp.asarray([2.3, 2.7, 9.0, -1.0])  # last two out of frame
        y = jnp.asarray([3.1, 3.9, 1.0, 1.0])
        rgb = jnp.ones((4, 3))
        f = film_mod.splat(f, x, y, rgb)
        buf = np.asarray(f.buffer)
        assert buf[3, 2, 0] == pytest.approx(2.0)  # both in same pixel
        assert buf.sum() == pytest.approx(6.0)     # out-of-frame dropped

    def test_splat_gaussian_conserves_energy(self):
        f = film_mod.new_film(16, 16)
        x = jnp.asarray([8.5, 4.2])
        y = jnp.asarray([8.5, 11.7])
        rgb = jnp.ones((2, 3))
        f = film_mod.splat(f, x, y, rgb, filter_size=2)
        assert np.asarray(f.buffer).sum() == pytest.approx(6.0, rel=1e-4)

    def test_checkpoint_roundtrip(self, tmp_path):
        f = film_mod.new_film(4, 4)
        f = film_mod.add_sample_image(f, jnp.ones((4, 4, 3)))
        p = str(tmp_path / "film.npz")
        save_film(p, f)
        g = load_film(p)
        np.testing.assert_array_equal(np.asarray(g.buffer),
                                      np.asarray(f.buffer))
        assert float(g.spp) == 1.0

    def test_checkpoint_missing(self, tmp_path):
        assert load_film(str(tmp_path / "nope.npz")) is None
