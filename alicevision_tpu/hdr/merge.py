"""HDR bracket merging with highlight handling.

TPU-native counterpart of the reference's merge
(ref: src/aliceVision/hdr/hdrMerge.cpp — weighted average of linearized
brackets divided by exposure, with highlight recovery from the shortest
exposure; brackets.cpp — exposure grouping). Pure batched array math.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .calibration import laguerre_inverse, weight_gaussian


def estimate_brackets(exposures: np.ndarray, n_brackets: int) -> list:
    """Group a sorted exposure sequence into bracket groups
    (hdr/brackets.cpp: consecutive runs of n_brackets)."""
    n = len(exposures)
    groups = []
    for s in range(0, n - n_brackets + 1, n_brackets):
        groups.append(list(range(s, s + n_brackets)))
    return groups


def merge_hdr(
    images: jnp.ndarray,  # (B, H, W[, C]) in [0, 1]
    exposures: jnp.ndarray,  # (B,)
    phi: jnp.ndarray | float = 0.0,  # Laguerre response parameter (0 = linear)
    highlight_rescale: bool = True,
    response: tuple | None = None,  # ("laguerre", phi) | ("grossberg", c) | ("debevec", g)
) -> jnp.ndarray:
    """Radiance map: sum_b w(z_b) lin(z_b)/dt_b / sum_b w(z_b).

    Saturated-everywhere pixels fall back to the shortest exposure's
    linearized value (highlight recovery). The inverse response defaults to
    the Laguerre family (phi); a precomputed curve from ldrToHdrCalibration
    can be passed via `response`."""
    if response is not None:
        kind, param = response
        param = jnp.asarray(param)
        if kind == "laguerre":
            lin = laguerre_inverse(param, images)
        elif kind == "grossberg":
            from .calibration import grossberg_apply

            lin = grossberg_apply(param, images)
        elif kind == "debevec":
            # g[z] = ln E + ln dt: exponentiate the tabulated log response.
            n_levels = param.shape[0]
            z = jnp.clip((images * (n_levels - 1)).astype(jnp.int32), 0, n_levels - 1)
            lin = jnp.exp(param[z])
        else:  # pragma: no cover
            raise ValueError(f"unknown response kind {kind!r}")
    else:
        phi = jnp.asarray(phi)
        lin = laguerre_inverse(phi, images)
    shape = [-1] + [1] * (images.ndim - 1)
    dt = exposures.reshape(shape)
    w = weight_gaussian(images)
    # exclude fully saturated / fully dark from the weighting
    w = jnp.where((images > 0.995) | (images < 0.005), 0.0, w)
    num = jnp.sum(w * lin / dt, axis=0)
    den = jnp.sum(w, axis=0)

    shortest = jnp.argmin(exposures)
    fallback = lin[shortest] / exposures[shortest]
    merged = jnp.where(den > 1e-6, num / jnp.maximum(den, 1e-6), fallback)

    if highlight_rescale:
        # saturated in ALL brackets -> clamp to the brightest recoverable
        # radiance to avoid magenta-style blowouts
        all_sat = jnp.all(images > 0.995, axis=0)
        merged = jnp.where(all_sat, jnp.maximum(merged, fallback), merged)
    return merged


def highlight_recovery(
    radiance: jnp.ndarray,  # (H, W[, C]) merged radiance
    brightest_ldr: jnp.ndarray,  # (H, W[, C]) most-exposed LDR in [0, 1]
    target_exposure: float,
    correction_factor: float = 1.0,
    target_lux: float = 120000.0,
) -> jnp.ndarray:
    """Clamped-highlight compensation (ref: hdrMerge.cpp:199-272).

    Per pixel, a soft clamped-ness score from the most-exposed LDR
    (inverse sigmoid around 0.95, width 0.08, hdrMerge.cpp:39-42) is
    averaged over channels, Gaussian-smoothed, and used to blend the
    radiance toward highlightTarget = target_lux * target_exposure * 2.5
    wherever the merged radiance is below that target.
    """
    if correction_factor == 0.0:
        return radiance
    from ..image.filtering import gaussian_blur

    target = target_lux * target_exposure * 2.5
    z = brightest_ldr
    clamped = 1.0 / (1.0 + jnp.exp(10.0 * ((0.95 - z) / 0.08)))
    if clamped.ndim == 3:
        clamped = jnp.mean(clamped, axis=-1)
    clamped_g = gaussian_blur(clamped, 1.0)
    comp = jnp.clip(correction_factor * clamped_g, 0.0, 1.0)
    comp = comp[..., None] if radiance.ndim == 3 else comp
    recovered = comp * target + (1.0 - comp) * radiance
    return jnp.where(radiance < target, recovered, radiance)
