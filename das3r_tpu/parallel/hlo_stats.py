"""Interconnect-neutral communication accounting from compiled HLO.

The virtual CPU mesh cannot measure ICI bandwidth (its "efficiency"
numbers measure host oversubscription — docs/PERF.md), but the compiled
program's COMMUNICATION VOLUME is backend-independent: the same GSPMD
partitioning produces the same collectives whether the mesh is 8 virtual
CPU devices or a real TPU slice. This module walks an optimized HLO dump
and sums the bytes moved by each collective family, giving a per-step
comm-volume table that a future real-slice run can be compared against
(see scripts/bench_scaling.py --collectives / --weak).

Byte convention: for each collective op we count the op's RESULT shape
bytes (per participating device). That is the data landing on each
device: all-gather results count the full gathered size, reduce-scatter
results the scattered shard, all-reduce the reduced buffer. Async pairs
(``*-start``/``*-done``) are counted once at the start op.
"""
from __future__ import annotations

import re
from collections import defaultdict

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1,
    "pred": 1, "c64": 8, "c128": 16,
}

COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute", "all-to-all")

# "%x = f32[128,3]{1,0} all-reduce(...)" / tuple results / async starts
_LINE_RE = re.compile(
    r"=\s+(?P<shapes>[^=]*?)\s+"
    r"(?P<op>" + "|".join(COLLECTIVE_OPS) + r")(?P<suffix>-start|-done)?\(")
_SHAPE_RE = re.compile(r"(?P<dt>[a-z]+\d*)\[(?P<dims>[\d,]*)\]")


def shape_bytes(shape: str) -> int:
    """Bytes of one HLO shape token like ``f32[128,3]``."""
    m = _SHAPE_RE.match(shape)
    if not m or m.group("dt") not in _DTYPE_BYTES:
        return 0
    n = 1
    dims = m.group("dims")
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * _DTYPE_BYTES[m.group("dt")]


def collective_bytes(hlo_text: str) -> dict:
    """Sum result bytes per collective family over an HLO module dump.

    Returns {"all-reduce": {"bytes": int, "count": int}, ...} including
    only families that appear. Use ``jax.jit(f).lower(*args).compile()
    .as_text()`` for the optimized (post-GSPMD) module.
    """
    out: dict = defaultdict(lambda: {"bytes": 0, "count": 0})
    for line in hlo_text.splitlines():
        m = _LINE_RE.search(line)
        if not m or m.group("suffix") == "-done":
            continue
        total = sum(shape_bytes(s.group(0))
                    for s in _SHAPE_RE.finditer(m.group("shapes")))
        fam = out[m.group("op")]
        fam["bytes"] += total
        fam["count"] += 1
    return dict(out)


def total_collective_bytes(hlo_text: str) -> int:
    return sum(v["bytes"] for v in collective_bytes(hlo_text).values())
