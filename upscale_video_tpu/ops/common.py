"""Shared geometry helpers for the Pallas kernels.

One copy of the alignment rule and the chain/tail tile defaults: the
bordered-chain producer (conv_chain.py) and its tail consumer
(tail_pallas.py) must agree on tile geometry — the ring-layout arrays
carry no metadata, so a silent mismatch corrupts output (review finding).
"""

# default spatial tile of the bordered-chain layout; sr_tail_fused_chain
# must be called with the SAME tiles that produced its input array
CHAIN_TILE_H = 48
CHAIN_TILE_W = 384


def round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m
