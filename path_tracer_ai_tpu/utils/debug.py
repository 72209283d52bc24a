"""Numerical-validity debugging (SURVEY.md §5 "race detection / sanitizers").

The reference's runtime guards are NaN/Inf checks with magenta sentinels and
console warnings (renderer.hpp:75-79,112-123). Under JAX's functional model
data races are structurally impossible; what remains is numeric validity:

- `validate_image`: post-render audit mirroring isValidColor over the frame
- `assert_finite`: checkify-style guard usable inside jitted code paths
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.utils.logging import get_logger

log = get_logger(__name__)

MAGENTA = np.asarray([1.0, 0.0, 1.0], np.float32)


class ImageAudit(NamedTuple):
    finite: bool
    n_nan: int
    n_inf: int
    n_magenta: int   # invalid-sample sentinel pixels (renderer.hpp:78)
    n_negative: int


def validate_image(image: np.ndarray) -> ImageAudit:
    img = np.asarray(image)
    nan = int(np.isnan(img).sum())
    inf = int(np.isinf(img).sum())
    magenta = int((np.abs(img - MAGENTA).max(axis=-1) < 1e-6).sum())
    neg = int((img < 0).sum())
    audit = ImageAudit(
        finite=(nan == 0 and inf == 0),
        n_nan=nan, n_inf=inf, n_magenta=magenta, n_negative=neg,
    )
    if not audit.finite or audit.n_magenta:
        log.warning(
            "Image audit: %d NaN, %d Inf, %d magenta sentinel px, %d negative",
            nan, inf, magenta, neg,
        )
    return audit


def assert_finite(x: jnp.ndarray, name: str = "value"):
    """In-jit finiteness check via jax.debug (no-op on valid data).

    Unlike the reference's early-return guards (renderer.hpp:161-163), this
    reports without changing radiance — the engines' masking already
    implements the semantic filtering.
    """
    bad = jnp.sum(~jnp.isfinite(x))
    jax.lax.cond(
        bad > 0,
        lambda: jax.debug.print(
            "WARNING: {n} non-finite elements in " + name, n=bad
        ),
        lambda: None,
    )
    return x
