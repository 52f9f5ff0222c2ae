"""Sweep the fused-GCN kernel's rows-per-program tile on the real TPU.

The unrolled kernel measured TILE=64 -> 33.0 MB scoped VMEM (OOM),
TILE=32 -> 16.21 MB (216 KB over the limit), so TILE=16 shipped.  The
rolled per-head loop keeps ~4x fewer live attention buffers, so larger
tiles may now fit — and fewer, bigger programs mean larger MXU GEMMs
((tile*J, F) x (F, HF)) for a kernel that is small-matmul-bound, not
bandwidth-bound (HBM in+out at (8192,42,64) f32 is ~176 MB = 0.2 ms at
819 GB/s vs the ~20 ms measured).

Carry-chained timing with a d2h sync per variant (see
.claude/skills/verify/SKILL.md).  Usage:
    python scripts/gcn_tile_sweep.py [--edge] [tile ...]  # default 16 32 64
``--edge`` sweeps the edge-incidence v2 kernel instead of the rolled
dense kernel.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(tiles, edge=False):
    import jax
    import jax.numpy as jnp

    from a2m import constants
    from a2m.nn.graph import GCNStack
    from a2m.nn.pallas_gcn import extract_stack_params, fused_gcn_stack

    b, t, f = 128, 64, 64
    for j, edges in ((42, constants.hand_edges()),
                     (10, constants.body_edges())):
        adj = constants.adjacency_from_edges(edges, j)
        stack = GCNStack(f, adj, heads=4)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (b * t, j, f)), jnp.float32)
        variables = jax.jit(stack.init)(jax.random.PRNGKey(0), x)
        params = extract_stack_params(variables['params'])

        for tile in tiles:
            @jax.jit
            def step(x, carry, _tile=tile):
                y = fused_gcn_stack(x + carry, params, adj, heads=4,
                                    rolled=not edge, tile=_tile,
                                    edge_form=edge)
                return y, carry + y.mean()

            try:
                carry = jnp.float32(0.0)
                y, carry = step(x, carry)
                float(carry)                      # compile + warm + sync
                iters = 30
                t0 = time.perf_counter()
                for _ in range(iters):
                    y, carry = step(x, carry)
                float(carry)
                ms = (time.perf_counter() - t0) / iters * 1e3
                print(json.dumps({'j': j, 'tile': tile, 'edge': edge,
                                  'ms': round(ms, 2)}), flush=True)
            except Exception as e:  # VMEM OOM etc. — report and continue
                msg = str(e).splitlines()[0][:160]
                print(json.dumps({'j': j, 'tile': tile, 'edge': edge,
                                  'error': msg}), flush=True)


if __name__ == '__main__':
    argv = sys.argv[1:]
    edge = '--edge' in argv
    tiles = [int(a) for a in argv if a != '--edge']
    main(tiles or [16, 32, 64], edge=edge)
