"""utils: profiling, debug audits, device-buffer helpers, logging."""

import numpy as np
import jax.numpy as jnp

from path_tracer_ai_tpu.utils.debug import validate_image
from path_tracer_ai_tpu.utils.device import download, nbytes_of, upload
from path_tracer_ai_tpu.utils.profiling import Timer, timed


def test_validate_image_flags_problems():
    img = np.zeros((4, 4, 3), np.float32)
    img[0, 0] = np.nan
    img[1, 1] = np.inf
    img[2, 2] = (1.0, 0.0, 1.0)  # magenta sentinel
    audit = validate_image(img)
    assert not audit.finite
    assert audit.n_nan == 3 and audit.n_inf == 3
    assert audit.n_magenta == 1


def test_validate_clean_image():
    audit = validate_image(np.full((4, 4, 3), 0.5, np.float32))
    assert audit.finite and audit.n_magenta == 0


def test_upload_download_roundtrip(rng):
    x = rng.standard_normal((16, 3)).astype(np.float32)
    np.testing.assert_array_equal(download(upload(x)), x)


def test_nbytes_of_pytree():
    tree = {"a": jnp.zeros((10, 3), jnp.float32), "b": jnp.zeros((5,), jnp.int32)}
    assert nbytes_of(tree) == 10 * 3 * 4 + 5 * 4


def test_timer_sections():
    t = Timer()
    with t.section("x"):
        sum(range(1000))
    with t.section("x"):
        pass
    assert t.counts["x"] == 2
    assert "x:" in t.report()


def test_timed_excludes_compile():
    import jax

    f = jax.jit(lambda x: x * 2)
    result, per_call = timed(f, jnp.ones(8), n=2)
    assert per_call >= 0
    np.testing.assert_array_equal(np.asarray(result), 2.0 * np.ones(8))
