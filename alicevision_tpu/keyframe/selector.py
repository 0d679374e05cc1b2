"""Video keyframe selection: sharpness + motion scoring, smart selection.

TPU-native counterpart of the reference's keyframe module
(ref: src/aliceVision/keyframe/KeyframeSelector.hpp:66-98;
KeyframeSelector.cpp:195-340 smart selection, :996-1062 computeSharpness,
:1104-1190 estimateFlow). Scoring parity:

  * sharpness score = MAX over a sliding window (stride = windowSize/4) of
    the standard deviation of the image Laplacian, computed from integral
    images (KeyframeSelector.cpp:996-1062) — all windows evaluated at once
    from two cumsum tables;
  * flow score = MEDIAN over cells of the mean per-cell displacement
    magnitude (estimateFlow's motionByCell, :1161-1190). The reference's
    DeepFlow is replaced by PYRAMIDAL block matching (coarse-to-fine
    integer search refined per level, evaluated as stacked shifted-
    difference maps — pure VPU work, no data-dependent loops);
  * smart selection follows the reference exactly: accumulate flow scores
    until `pxDisplacement % of min(W, H)`, adjust the step by +-0.5 until
    the keyframe count lands in [minOutFrames, maxOutFrames] (regular
    sampling once the step hits 0), then pick per subsequence the frame
    maximizing sharpness x a triangular center-weight in [1, 2]
    (KeyframeSelector.cpp:195-340).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _integral(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded 2-D integral image (cv::integral semantics)."""
    s = jnp.cumsum(jnp.cumsum(x, axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)))


def sharpness_score(img: jnp.ndarray, window_size: int = 200) -> jnp.ndarray:
    """Max windowed Laplacian-stddev (computeSharpness, .cpp:996-1062).

    All sliding windows (stride windowSize/4) are evaluated in one shot
    from the integral and squared-integral tables of the Laplacian."""
    H, W = img.shape
    window_size = int(min(window_size, H, W))
    lap = (
        -4.0 * img
        + jnp.roll(img, 1, 0)
        + jnp.roll(img, -1, 0)
        + jnp.roll(img, 1, 1)
        + jnp.roll(img, -1, 1)
    )
    s1 = _integral(lap)
    s2 = _integral(lap * lap)
    step = max(window_size // 4, 1)
    ys = np.unique(
        np.r_[np.arange(0, H - window_size + 1, step), H - window_size]
    )
    xs = np.unique(
        np.r_[np.arange(0, W - window_size + 1, step), W - window_size]
    )
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    gy = jnp.asarray(gy.ravel())
    gx = jnp.asarray(gx.ravel())
    w = window_size

    def box(tbl):
        return (
            tbl[gy + w, gx + w] + tbl[gy, gx]
            - tbl[gy, gx + w] - tbl[gy + w, gx]
        )

    n = float(w * w)
    var = (box(s2) - box(s1) ** 2 / n) / n
    return jnp.sqrt(jnp.max(jnp.maximum(var, 0.0)))


def block_flow_field(
    a: jnp.ndarray, b: jnp.ndarray, block: int = 16, search: int = 4,
    levels: int = 3,
) -> tuple:
    """Pyramidal block-matching flow: per-block (dy, dx) at full scale.

    Coarse-to-fine: the search at level l covers +-search * 2^l pixels at
    full resolution, so large displacements are captured without widening
    the per-level stack. Everything is batched shifted-difference maps."""
    from ..image.filtering import gaussian_blur

    # proper image pyramid: low-pass before each decimation — raw striding
    # aliases (a 3 px shift decimated by 2 lands on opposite sample phases
    # and the coarse SAD matches noise, measured as sign-flipped flow)
    pyr = [(a, b)]
    for _ in range(levels - 1):
        pa, pb = pyr[-1]
        pyr.append(
            (gaussian_blur(pa, 1.0)[::2, ::2], gaussian_blur(pb, 1.0)[::2, ::2])
        )
    flows = None
    for lvl in range(levels - 1, -1, -1):
        al, bl = pyr[lvl]
        H, W = al.shape
        nby, nbx = max(H // block, 1), max(W // block, 1)
        Hc, Wc = nby * block, nbx * block
        al = al[:Hc, :Wc]
        bl = bl[:Hc, :Wc]
        if flows is None:
            init = jnp.zeros((2, nby, nbx))
        else:
            # upsample the coarser flow (in this level's pixel units);
            # edge-pad when the finer block grid is more than 2x the
            # coarser one (odd sizes)
            def up(f):
                f = jnp.repeat(jnp.repeat(f * 2.0, 2, 0), 2, 1)
                f = jnp.pad(
                    f,
                    ((0, max(nby - f.shape[0], 0)),
                     (0, max(nbx - f.shape[1], 0))),
                    mode="edge",
                )
                return f[:nby, :nbx]

            init = jnp.stack([up(flows[0]), up(flows[1])])
        init_px = jnp.repeat(
            jnp.repeat(init, block, axis=1), block, axis=2
        )[:, :Hc, :Wc].astype(jnp.int32)
        pad = search + int(
            max(1, float(jnp.max(jnp.abs(init_px))) if flows is not None else 1)
        )
        b_pad = jnp.pad(bl, ((pad, pad), (pad, pad)), mode="edge")
        ys = jnp.arange(Hc)[:, None]
        xs = jnp.arange(Wc)[None, :]
        best = (
            jnp.full((nby, nbx), jnp.inf),
            jnp.zeros((nby, nbx)),
            jnp.zeros((nby, nbx)),
        )
        for dy in range(-search, search + 1):
            for dx in range(-search, search + 1):
                yy = jnp.clip(ys + init_px[0] + dy + pad, 0, Hc + 2 * pad - 1)
                xx = jnp.clip(xs + init_px[1] + dx + pad, 0, Wc + 2 * pad - 1)
                diff = jnp.abs(al - b_pad[yy, xx])
                sad = diff.reshape(nby, block, nbx, block).sum(axis=(1, 3))
                better = sad < best[0]
                best = (
                    jnp.where(better, sad, best[0]),
                    jnp.where(better, init[0] + dy, best[1]),
                    jnp.where(better, init[1] + dx, best[2]),
                )
        flows = (best[1], best[2])
    return flows


def block_flow_displacement(
    a: jnp.ndarray, b: jnp.ndarray, block: int = 16, search: int = 4,
    levels: int = 2,
) -> jnp.ndarray:
    """Flow score: MEDIAN over cells of the displacement magnitude
    (estimateFlow's median over motionByCell, .cpp:1161-1190)."""
    dy, dx = block_flow_field(a, b, block=block, search=search, levels=levels)
    return jnp.median(jnp.sqrt(dy * dy + dx * dx))


def select_keyframes_regular(n_frames: int, step: int) -> np.ndarray:
    """Fixed-stride selection (KeyframeSelector regular mode)."""
    return np.arange(0, n_frames, step)


def _subsequence_limits(flow_scores, step):
    limits = [0]
    acc = 0.0
    n = len(flow_scores)
    for i in range(1, n - 1):
        acc += flow_scores[i] if flow_scores[i] > -1.0 else 0.0
        if acc >= step:
            limits.append(i)
            acc = 0.0
    limits.append(n - 1)
    return limits


def select_keyframes_smart(
    frames: list,
    px_displacement: float = 10.0,
    min_out_frames: int = 1,
    max_out_frames: int | None = None,
    sharpness_window: int = 200,
    flow_cell: int = 16,
    # legacy knobs: sharp_window maps onto sharpness_window and
    # motion_threshold onto the accumulation step; min_gap/max_gap have NO
    # counterpart in the reference's smart selection and are IGNORED with a
    # DeprecationWarning (KeyframeSelector.cpp:195-340 paces subsequences
    # purely by accumulated motion).
    min_gap: int | None = None,
    max_gap: int | None = None,
    motion_threshold: float | None = None,
    sharp_window: int | None = None,
) -> np.ndarray:
    """Smart selection with the reference's exact structure
    (KeyframeSelector.cpp:195-340): motion-accumulated subsequence limits
    with +-0.5 step adaptation toward [minOutFrames, maxOutFrames], then
    the center-weighted sharpest frame per subsequence."""
    import warnings

    if min_gap is not None or max_gap is not None:
        warnings.warn(
            "min_gap/max_gap are not part of the reference smart selection "
            "and are ignored; pace subsequences with px_displacement / "
            "motion_threshold instead",
            DeprecationWarning,
            stacklevel=2,
        )
    if sharp_window is not None:
        sharpness_window = sharp_window
    n = len(frames)
    if n == 0:
        return np.zeros(0, np.int64)
    if n == 1:
        return np.zeros(1, np.int64)
    H, W = np.asarray(frames[0]).shape
    if max_out_frames is None:
        max_out_frames = n
    sharp = np.array(
        [
            float(sharpness_score(jnp.asarray(f), sharpness_window))
            for f in frames
        ]
    )
    flow = np.full(n, -1.0)
    for i in range(1, n):
        flow[i] = float(
            block_flow_displacement(
                jnp.asarray(frames[i]), jnp.asarray(frames[i - 1]),
                block=flow_cell,
            )
        )
    if motion_threshold is not None:  # legacy parametrization: direct step
        step = float(motion_threshold)
    else:
        step = px_displacement * min(W, H) / 100.0

    limits = _subsequence_limits(flow, step)
    n_key = len(limits) - 1
    if not (min_out_frames <= n_key <= max_out_frames):
        diff = 0.5
        if n_key < min_out_frames:
            while len(limits) - 1 < min_out_frames and step > 0.0:
                step = max(0.0, step - diff)
                if step == 0.0:
                    stride = n // min_out_frames + 1
                    limits = [0] + list(range(1, n - 1, stride)) + [n - 1]
                    break
                limits = _subsequence_limits(flow, step)
        else:
            while len(limits) - 1 > max_out_frames:
                step += diff
                limits = _subsequence_limits(flow, step)

    selected = []
    for i in range(1, len(limits)):
        lo, hi = limits[i - 1], limits[i]
        idx = np.arange(lo, hi)
        if len(idx) == 0:
            idx = np.array([lo])
        j = idx[int(np.argmax(sharp[idx] * _center_weights(len(idx))))]
        selected.append(int(j))
    return np.array(sorted(set(selected)), np.int64)


def _center_weights(size: int) -> np.ndarray:
    """The reference's deque-built center weights (KeyframeSelector.cpp
    smart selection): 2.0 at the middle frame (odd size) or at BOTH middle
    frames (even size), stepping outward by 2/(size-1) — so even sizes get
    endpoints 1 + 1/(size-1), odd sizes exactly 1.0."""
    if size <= 1:
        return np.full(max(size, 1), 2.0)
    pos = np.arange(size, dtype=np.float64)
    if size % 2:
        dist = np.abs(pos - (size - 1) / 2.0)
    else:
        dist = np.where(pos < size / 2, size / 2 - 1 - pos, pos - size / 2)
    return 2.0 - dist * (2.0 / (size - 1))
