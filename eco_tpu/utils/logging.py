"""Minimal structured logging (glog-style prefixes, rank-aware).

The reference silences non-rank-0 logs (common.cpp:70-73); ``log`` does the
same by default across JAX processes.
"""

from __future__ import annotations

import sys
import time


def log(msg: str, *, all_ranks: bool = False) -> None:
    import jax

    if not all_ranks and jax.process_index() != 0:
        return
    ts = time.strftime("%m%d %H:%M:%S")
    print(f"I{ts} {msg}", file=sys.stderr, flush=True)
