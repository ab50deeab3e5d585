"""Static rasterization settings.

Mirrors the semantic surface of the reference's
``GaussianRasterizationSettings`` (gaussian_renderer/__init__.py:62-78) but
splits *static* quantities (shapes, tiling, capacities — things XLA must know
at trace time) from *runtime* tensors (matrices, bg color), which are plain
function arguments so they can carry gradients.

The near-plane default is 0.001, reproducing the patched CUDA rasterizer
(reference README.md:41-44: ``p_view.z <= 0.2f`` -> ``0.001f``).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    image_height: int
    image_width: int
    sh_degree: int = 3          # ACTIVE degree (static: changes recompile)
    near: float = 0.001         # patched near-plane cull threshold
    scale_modifier: float = 1.0
    tile: int = 16              # tile side in pixels
    max_per_tile: int = 1024    # per-tile Gaussian capacity K (depth-sorted,
                                # farthest truncated on overflow)
    max_tiles_per_gaussian: int = 64  # duplication cap D during binning
    alpha_floor: float = 1.0 / 255.0  # CUDA skip threshold
    transmittance_eps: float = 1e-4   # CUDA early-termination threshold
    alpha_clip: float = 0.99
    # Optional compaction capacity for the binning sort: when set, the
    # N*D duplication table is compacted to this many real entries before
    # sorting (entries of the FARTHEST Gaussians beyond the cap are
    # dropped, reported via TileBins.entry_overflow). None = exact.
    max_total_entries: int | None = None
    # Below this table size (N * max_tiles_per_gaussian), binning sorts the
    # FULL padded table and skips compaction even when max_total_entries is
    # set: the compaction scatter is a serial loop on TPU (~16 ns/entry)
    # while the payload-free uint32 sort is fast — measured 68->57 ms
    # fwd+bwd at a 3.2M table and 474->230 ms prep+binning at 48M
    # (docs/PERF.md). Also exact: no entry drops. Above the threshold the
    # 4B*N*D table's memory (e.g. 640 MB at 5M x 32) argues for the
    # compact buffer again. Set 0 to force compaction when
    # max_total_entries is set.
    full_sort_below: int = 64_000_000
    # When > 0, pack a depth quantized to this many bits into the sort key
    # (tile << bits | depth_q) instead of exact depth ranks — removes the
    # global N-element depth argsort from binning. Gaussians closer than
    # (depth range / 2^bits) may blend in arbitrary relative order (the
    # CUDA reference orders by full float32 bits; visually indistinguishable
    # at >= 20 bits). 0 = exact rank path.
    depth_sort_bits: int = 0
    # Opacity-aware binning (EXACT, image-preserving): (a) the binning rect
    # shrinks to the isoline where peak alpha = opacity * exp(-q/2) crosses
    # the 1/255 floor (q_cap = 2 ln(op/floor), capped at the reference's
    # 3-sigma q=9), and (b) each surviving (Gaussian, tile) pair is kept
    # only if the minimum of the conic quadratic over the tile's pixel box
    # still reaches alpha >= floor. Pairs removed this way are skipped by
    # the CUDA reference's per-pixel ``alpha < 1/255`` test at EVERY pixel
    # of the tile, so they contribute nothing and carry no gradient — the
    # rendered image and all gradients are bitwise-independent of them.
    # The reported per-Gaussian ``radius`` (densify stats / visibility)
    # stays the reference's 3-sigma value. False = reference rect binning.
    tight_binning: bool = True
    # Window extraction backend on TPU: True = Pallas per-tile DMA at exact
    # element offsets (windows are [start, start+K), delta always 0);
    # False = 128-aligned whole-row gather with K+128 padded windows and a
    # per-tile ``delta`` of foreign leading entries. Identical semantics
    # (binning._windows); the DMA path keeps every downstream array at
    # K width.
    use_dma_windows: bool = True
    # Entry-stream blending (Pallas backend): walk a 128-aligned
    # variable-length per-tile entry stream instead of fixed [T, K] windows.
    # EXACT — no per-tile capacity, so ``max_per_tile`` never truncates —
    # and work scales with the actual entry count instead of
    # tiles x max-occupancy (per-tile occupancy is heavily skewed: the
    # 100k-Gaussian bench scene has mean 548 / max 2248 entries per tile).
    # Engaged when the backend is Pallas, ``max_total_entries`` is set
    # (it sizes the static stream; see models/autosize.py for the
    # per-scene probe) and the packable single-key path applies
    # ((n_tiles+1) << ceil(log2 N) within 32 bits); the [T, K] window path
    # is used otherwise. Exact depth ranks are always used here
    # (``depth_sort_bits`` is ignored by the stream).
    entry_stream: bool = True
    # Per-shard stream capacity for TILE-SHARDED entry-stream rendering
    # (each shard of the mesh's tile axis walks its own contiguous
    # sub-stream; see rasterize._entry_stream_sharded). None = the full
    # ``entry_stream_cap`` per shard — always correct but no memory
    # scaling; set (e.g. by the autosize probe's sharded mode) to bound
    # each shard at its measured local occupancy. Rounded up to 1024.
    # Tiles crossing a shard's cap lose their tail with entry_overflow
    # telemetry, same policy as the global cap.
    entries_per_shard: int | None = None
    # Split-width duplication table: the binning sort's domain is
    # N x max_tiles_per_gaussian slots, but per-Gaussian tile footprints
    # are heavily skewed (mean ~4 tiles vs probed caps of 32 at production
    # scale — an 8x sort-domain waste). When ``heavy_rows_cap`` is set,
    # every Gaussian emits its first ``light_dup_width`` rect cells into an
    # [N, light] table and only the few Gaussians touching MORE tiles are
    # compacted (depth-ordered) into a [heavy_rows_cap, D - light] table
    # for the remaining cells; both tables pack the SAME self-describing
    # (tile << nbits | depth-rank) keys and are sorted together, so the
    # sorted stream is IDENTICAL to the full-width table's whenever no
    # heavy row overflows. Heavy rows past the cap keep only their first
    # ``light_dup_width`` entries (farthest Gaussians first, same policy
    # as the entry cap) and the dropped-entry count is reported via
    # ``heavy_overflow`` — the trainer regrows the cap like the others.
    # None = single full-width table (exact, no cap). Sized per scene by
    # models/autosize.py.
    light_dup_width: int = 4
    heavy_rows_cap: int | None = None
    # Entry-stream backward: reduce per-entry gradients to per-Gaussian
    # rows by rank-sort + block-local prefix sums + boundary gathers
    # instead of a large-target scatter-add (XLA scatter degrades to
    # ~70 ns/row into multi-MB targets — 478 ms/step at 1.5M Gaussians;
    # see entry_blend._segment_sum_by_rank for the numerics). Falls back
    # to the scatter when max_tiles_per_gaussian exceeds the segment
    # block (a rank's run must span <= 2 blocks).
    segsum_grad_reduce: bool = True
    # ...but only at scale: into a SMALL table the scatter-add runs at
    # ~18 ns/row and the segsum's sort+permute overhead is a measured
    # ~3.6 ms/iter LOSS at 100k Gaussians (scripts/ab_regress_r4.py,
    # round 4) while being a multi-x win at 1.5M where the scatter
    # degrades. Segsum engages only when the table has at least this
    # many rows (~18 MB at 9 f32 attrs — safely past the scatter cliff).
    segsum_min_rows: int = 500_000
    # bf16-storage / fp32-accumulation variant of the entry-stream blend:
    # the depth-rank attribute table is stored as [N, 11] bf16 (mean2d as
    # a bf16 hi + lo pair — plain bf16 positions quantize to 2 px at
    # x ~ 512; conic/color/opacity single bf16) so the E-scale gather and
    # kernel VMEM traffic move 22 B/entry instead of 36. All blending math
    # and accumulators stay fp32; per-entry gradients and the per-Gaussian
    # scatter-add stay fp32. LOSSY: image error is dominated by the bf16
    # color/opacity ulp (~2e-3 abs on [0, 1]) — visually indistinguishable
    # but NOT oracle-exact, so it is opt-in (entry_blend.py quantization
    # analysis; A/B numbers in docs/PERF.md). Entry-stream path only.
    table_bf16: bool = False

    @property
    def tiles_x(self) -> int:
        return -(-self.image_width // self.tile)

    @property
    def tiles_y(self) -> int:
        return -(-self.image_height // self.tile)

    @property
    def n_tiles(self) -> int:
        return self.tiles_x * self.tiles_y
