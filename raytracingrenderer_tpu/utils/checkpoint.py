"""Film checkpoint/resume.

The reference's film is implicitly resumable across frames (sum + SPP,
Imaging.h:253-261) but has no persistence; here {buffer, spp, + optional
RNG bookkeeping} round-trips through one .npz file (SURVEY.md §5:
"save {film array, spp, RNG counter, params}").
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..imaging.film import Film


def save_film(path: str, film: Film) -> None:
    tmp = path + ".tmp.npz"
    np.savez(tmp, buffer=np.asarray(film.buffer),
             spp=np.asarray(film.spp))
    os.replace(tmp, path)


def load_film(path: str) -> Optional[Film]:
    if not os.path.isfile(path):
        return None
    with np.load(path) as z:
        return Film(buffer=jnp.asarray(z["buffer"]),
                    spp=jnp.asarray(z["spp"]))
