#!/usr/bin/env python
"""Launch-bound floor for the flagship train step (docs/PERF.md).

The MXU K-scaling microbench (tools/bench_k_scaling.py, PERF.md "MXU
K-scaling") measured that one VMEM-resident chain dot costs ~1.0 us on
this v5e REGARDLESS of K below 128 — the chain's dots are launch/issue
bound, not FLOP bound. That makes the total dot COUNT of a train step a
computable wall-clock floor:

    floor_ms = (total MXU dots issued by the Pallas chain kernels) x 1 us

This script counts those dots from the kernels' own tiling/packing rules
(imports the actual pickers, so the count tracks the code) for the
reference train config (batch 8, T=7, GT 144 -> 36x36 latents).

Everything NOT counted here (conv5-head adjoint, freq analyzer, nonlocal
aggs, GMM sample, losses, Adam — all XLA) is the gap between the floor
and the measured 96.4 ms step; see PERF.md "Launch-bound floor".
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfc_tpu.ops.pallas_chain import (  # noqa: E402
    GC,
    _pick_pack_w,
    _pick_tile_h_bwd,
    _pick_tile_h_v2,
)


def chain_dots_fwd(B, T, H, W, X):
    """Dots for ONE v2 chain forward. Grid (B/P, H/TH, T+1): 4 convs x
    3 dy-dots per t<T step + 1 conv5 phase dot per t>0 step."""
    P = _pick_pack_w(B * T, W)
    Bp = B // P
    TH = _pick_tile_h_v2(H, X + 4 * GC) or H
    tiles = H // TH
    return Bp * tiles * (T * 12 + T * 1), P, TH


def chain_dots_bwd(B, T, H, W, X):
    """Dots for ONE fused saved-feats adjoint. Grid (B*T/P, H/TH):
    reverse sweep k=4..1, per k 3 dy x (dW dot + dwork dot) = 24."""
    P = _pick_pack_w(B * T, W)
    BTp = (B * T) // P
    TH = _pick_tile_h_bwd(H, P * W, X) or H
    tiles = H // TH
    return BTp * tiles * 24, TH


def main():
    B, T = 8, 7
    H = W = 144 // 4  # latent 36x36 at scale 4

    # chain inventory per LOSS forward (flagship block_num [4,4], STP-6):
    #   encode: 8 InvBlockExp x (F: 48->3, H: 3->48, G: 3->48) = 24
    #   decode: STP backbone 6 D2DT chains (64ch) + 24 coupling = 30
    # value_and_grad = that forward once + one fused adjoint per chain.
    chains = [("F", 48)] * 8 + [("H", 3)] * 8 + [("G", 3)] * 8  # encode
    chains += [("STP", 64)] * 6 + list(chains)                   # decode

    fwd_total = bwd_total = 0
    for _, X in chains:
        f, P, THf = chain_dots_fwd(B, T, H, W, X)
        b, THb = chain_dots_bwd(B, T, H, W, X)
        fwd_total += f
        bwd_total += b
    total = fwd_total + bwd_total
    us_per_dot = 1.0  # measured: tools/bench_k_scaling.py
    floor_ms = total * us_per_dot / 1000.0
    print(f"chains/step: {len(chains)} fwd + {len(chains)} adjoint "
          f"(W-pack P={P}, TH fwd={THf} bwd={THb})")
    print(f"chain MXU dots/step: fwd {fwd_total} + bwd {bwd_total} "
          f"= {total}")
    print(f"floor at {us_per_dot:.1f} us/dot: {floor_ms:.1f} ms")
    print(f"measured step (PERF.md): 96.4 ms bf16 -> "
          f"{96.4 / floor_ms:.2f}x above the chain-dot floor")


if __name__ == "__main__":
    main()
