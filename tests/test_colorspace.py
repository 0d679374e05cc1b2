"""Color-space conversions (ref: image/colorspace.hpp, OIIO color
management; deviceColorConversion.cu rgb2lab)."""

import numpy as np
import jax.numpy as jnp
import pytest

from alicevision_tpu.image import colorspace as cs


def test_srgb_linear_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(64, 3))
    y = cs.linear_to_srgb(cs.srgb_to_linear(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_lab_roundtrip_and_known_values():
    x = jnp.asarray(np.random.RandomState(1).rand(32, 3))
    back = cs.lab_to_linear_rgb(cs.linear_rgb_to_lab(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    # white -> L=100, a=b=0
    lab_white = np.asarray(cs.linear_rgb_to_lab(jnp.ones((1, 3))))
    np.testing.assert_allclose(lab_white, [[100.0, 0.0, 0.0]], atol=1e-3)
    # black -> L=0
    lab_black = np.asarray(cs.linear_rgb_to_lab(jnp.zeros((1, 3))))
    np.testing.assert_allclose(lab_black[0, 0], 0.0, atol=1e-3)


def test_aces_roundtrips_preserve_luminance():
    x = jnp.asarray(np.random.RandomState(2).rand(16, 3))
    for space in ("aces2065-1", "acescg", "xyz", "rec709"):
        back = cs.convert(cs.convert(x, "linear", space), space, "linear")
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=2e-5)


def test_convert_dispatch_and_errors():
    x = jnp.ones((4, 3)) * 0.5
    assert cs.convert(x, "auto", "srgb") is x  # identity
    assert cs.convert(x, "srgb", "srgb") is x
    with pytest.raises(ValueError):
        cs.convert(x, "srgb", "nonsense")
    with pytest.raises(ValueError):
        cs.convert(x, "arri_logc3", "linear")  # needs vendor OCIO config
