"""Proof-of-distribution utilities.

Asserting an output sharding annotation only proves the *layout* request,
not that the compiled computation was actually partitioned (GSPMD can
silently all-gather and replicate the work).  These helpers extract the
two pieces of hard evidence from a compiled executable:

* the collective-op inventory of the optimized HLO (all-gather /
  all-to-all / all-reduce / collective-permute / reduce-scatter counts),
* the per-device memory footprint (must be ≪ the replicated-Σ footprint
  for a genuinely partitioned filter).

Used by tests/test_sharded_filter.py and benchmarks/scaling_dryrun.py.
"""
from __future__ import annotations

import re

import jax

COLLECTIVE_OPS = (
    "all-gather", "all-to-all", "all-reduce", "collective-permute",
    "reduce-scatter",
)


def compile_lowered(fn, *args, **kw):
    """jit + lower + compile, returning the Compiled object."""
    return jax.jit(fn, **kw).lower(*args).compile()


def collective_inventory(compiled) -> dict:
    """Count collective ops in optimized HLO (post-SPMD-partitioning)."""
    txt = compiled.as_text()
    counts = {}
    for op in COLLECTIVE_OPS:
        # HLO call sites look like "... = f32[...] all-gather(...)" (or the
        # async "-start" form); count those, not result-name mentions.
        counts[op] = len(re.findall(rf"\s{op}(?:-start)?(?:\.\d+)?\(", txt))
    counts["total"] = sum(counts[op] for op in COLLECTIVE_OPS)
    return counts


def memory_analysis(compiled) -> dict:
    """Per-device memory figures from the compiled executable (bytes)."""
    try:
        ma = compiled.memory_analysis()
    except Exception:  # backend without memory analysis
        return {}
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes",
              "alias_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k] = int(v)
    if out:
        out["peak_live_bytes_estimate"] = (
            out.get("argument_size_in_bytes", 0)
            + out.get("output_size_in_bytes", 0)
            + out.get("temp_size_in_bytes", 0)
            - out.get("alias_size_in_bytes", 0))
    return out
