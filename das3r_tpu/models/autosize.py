"""Per-scene static-capacity probing.

XLA needs every shape at trace time, so the rasterizer's entry capacity
(``RasterSettings.max_total_entries``) is a compile-time constant — but the
right value is scene-dependent: per-tile occupancy is heavily skewed and
total (Gaussian, tile) pair counts vary ~10x between scenes. The CUDA
reference sizes its buffers dynamically per frame
(diff-gaussian-rasterization's ``resizeFunctional`` growth callback); the
TPU-native equivalent is ONE cheap probe render per scene before the first
jit of the train step, picking the capacity from measured occupancy plus a
margin (Gaussians move during training; overflow is reported via
``RasterAux.entry_overflow``, dropping farthest entries only).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from das3r_tpu.ops.splat import RasterSettings


class ProbeStats(NamedTuple):
    """Per-scene capacity probe results (max over sampled views)."""
    max_total: int      # peak 128-aligned kept entry total
    max_tile: int       # peak per-tile occupancy
    max_dup: int        # peak per-Gaussian rect tile count (pre-cap)
    heavy_rows: int     # Gaussians touching > settings.light_dup_width
    dup_hist: tuple     # counts > each rasterize.DUP_HIST_WIDTHS entry


def probe_capacities(params, meta, settings: RasterSettings, poses7,
                     fovx, fovy, mode: str = "train",
                     max_views: int = 8) -> ProbeStats:
    """One cheap probe pass over sampled views.

    ``poses7``: [F, 7] pose array; up to ``max_views`` evenly-spaced views
    are rendered with a throwaway 128-capacity config (counts come from the
    pre-truncation binning telemetry, so the tiny capacity is free).
    "Heavy rows" = Gaussians touching more than
    ``settings.light_dup_width`` tiles — the row count the split dup
    table's heavy side must hold (RasterAux.heavy_rows); ``dup_hist``
    gives the same count at every candidate light width so
    ``auto_split_table`` can pick the cheapest split."""
    from das3r_tpu.models import render as render_mod
    from das3r_tpu.ops.splat.rasterize import DUP_HIST_WIDTHS

    probe_settings = dataclasses.replace(
        settings, max_per_tile=128, entry_stream=False,
        heavy_rows_cap=None)
    poses7 = jnp.asarray(poses7)
    f = poses7.shape[0]
    if f > max_views:
        idx = jnp.linspace(0, f - 1, max_views).astype(jnp.int32)
        poses7 = poses7[idx]

    @jax.jit
    def run(stacked):
        def body(carry, pose7):
            mx_total, mx_tile, mx_dup, mx_heavy, mx_hist = carry
            out = render_mod.render(params, meta, probe_settings, pose7,
                                    jnp.zeros(3), fovx, fovy, mode=mode)
            fc = out.aux.n_contrib_tiles
            aligned = jnp.sum(((fc + 127) // 128) * 128)
            return (jnp.maximum(mx_total, aligned),
                    jnp.maximum(mx_tile, jnp.max(fc)),
                    jnp.maximum(mx_dup, out.aux.max_tiles_touched),
                    jnp.maximum(mx_heavy, out.aux.heavy_rows),
                    jnp.maximum(mx_hist, out.aux.dup_hist)), ()
        init = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.zeros(len(DUP_HIST_WIDTHS), jnp.int32))
        (mx_total, mx_tile, mx_dup, mx_heavy, mx_hist), _ = jax.lax.scan(
            body, init, stacked)
        return mx_total, mx_tile, mx_dup, mx_heavy, mx_hist

    mx_total, mx_tile, mx_dup, mx_heavy, mx_hist = run(poses7)
    return ProbeStats(int(mx_total), int(mx_tile), int(mx_dup),
                      int(mx_heavy), tuple(int(c) for c in mx_hist))


def probe_entry_stats(params, meta, settings: RasterSettings, poses7,
                      fovx, fovy, mode: str = "train",
                      max_views: int = 8):
    """Legacy 4-tuple view of :func:`probe_capacities`."""
    st = probe_capacities(params, meta, settings, poses7, fovx, fovy,
                          mode=mode, max_views=max_views)
    return st.max_total, st.max_tile, st.max_dup, st.heavy_rows


def auto_entry_cap(params, meta, settings: RasterSettings, poses7,
                   fovx, fovy, margin: float = 1.2,
                   mode: str = "train") -> int:
    """``max_total_entries`` for this scene: measured peak ALIGNED entry
    total (128-chunk padding included) x margin, rounded up to the stream
    block (1024), floored at 8 blocks."""
    mx_total, _, _, _ = probe_entry_stats(params, meta, settings, poses7,
                                          fovx, fovy, mode=mode)
    cap = max(int(mx_total * margin), 8 * 1024)
    return -(-cap // 1024) * 1024


def auto_dup_cap(params, meta, settings: RasterSettings, poses7,
                 fovx, fovy, margin: float = 1.3,
                 mode: str = "train") -> int:
    """``max_tiles_per_gaussian`` for this scene: measured peak rect tile
    count x margin, rounded up to a multiple of 4, floored at 8.

    The duplication table the binning sort works over is
    N x max_tiles_per_gaussian slots, so an oversized cap directly
    multiplies the sort domain — at 1.5M Gaussians the default cap of 32
    makes a 48M-slot table even when no Gaussian touches more than ~10
    tiles. Overflow during training (Gaussians growing past the probed
    cap) is reported via RasterAux.dup_overflow and regrown by the
    trainer like the entry capacity."""
    _, _, mx_dup, _ = probe_entry_stats(params, meta, settings, poses7,
                                        fovx, fovy, mode=mode)
    cap = max(int(mx_dup * margin), 8)
    return min(-(-cap // 4) * 4, settings.max_tiles_per_gaussian)


# Split-table break-even: below this many dup-table slots (N x dup cap)
# the full-width sort domain is cheap and the split table's heavy-row
# compaction is pure overhead — measured 3.4 ms/iter LOSS at 100k x 32
# (3.2M slots; scripts/ab_regress_r4.py, round 4) vs a win at 1.5M x 16+.
SPLIT_TABLE_MIN_SLOTS = 8 * 1024 * 1024


def auto_heavy_cap(mx_heavy: int, n_gaussians: int | None = None,
                   dup_cap: int | None = None,
                   margin: float = 1.5) -> int | None:
    """``heavy_rows_cap`` from a probed peak heavy-row count: x margin
    (heavy membership is the most drift-prone capacity — a Gaussian only
    needs to GROW to cross the light width), rounded up to 1024, floored
    at 4096 rows. Overflow during training demotes the farthest heavy
    Gaussians to their first ``light_dup_width`` entries and reports
    ``heavy_overflow``; the trainer regrows the cap on that signal.

    When ``n_gaussians``/``dup_cap`` are given, returns None (single
    full-width table) below ``SPLIT_TABLE_MIN_SLOTS`` — the split only
    pays for itself at scale."""
    if (n_gaussians is not None and dup_cap is not None
            and n_gaussians * dup_cap < SPLIT_TABLE_MIN_SLOTS):
        return None
    return -(-max(int(mx_heavy * margin), 4096) // 1024) * 1024


def auto_split_table(stats: ProbeStats, n_gaussians: int, dup_cap: int,
                     margin: float = 1.5):
    """Pick the split-table shape minimizing the binning sort domain.

    The domain is ``n*L + heavy_cap(L) * (dup_cap - L)`` slots; the probe
    histogram gives heavy_cap at every candidate L (round-4 profile: the
    key sort is ~30% of the 1.5M step and scales with this domain, so a
    poorly-chosen light width — e.g. the old fixed L=4 putting 42% of
    Gaussians in full-width rows — costs >100 ms/iter). Returns
    ``{"light_dup_width": L, "heavy_rows_cap": cap}`` or
    ``{"heavy_rows_cap": None}`` when no split beats the full-width table
    or the domain is below ``SPLIT_TABLE_MIN_SLOTS``."""
    from das3r_tpu.ops.splat.rasterize import DUP_HIST_WIDTHS

    no_split = {"heavy_rows_cap": None}
    if n_gaussians * dup_cap < SPLIT_TABLE_MIN_SLOTS:
        return no_split
    best_cost, best = n_gaussians * dup_cap, no_split
    for w, cnt in zip(DUP_HIST_WIDTHS, stats.dup_hist):
        if not 0 < w < dup_cap:
            continue
        h_cap = -(-max(int(cnt * margin), 4096) // 1024) * 1024
        cost = n_gaussians * w + h_cap * (dup_cap - w)
        if cost < best_cost:
            best_cost = cost
            best = {"light_dup_width": w, "heavy_rows_cap": h_cap}
    return best
