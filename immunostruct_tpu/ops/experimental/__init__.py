"""Superseded/losing kernel generations, kept as parity-tested measured
negative results (benchmarks/RESULTS.md rounds 2-3; VERDICT r3 item 9):

- ``pallas_segment``: tiny per-op scatter/gather kernels — lose to XLA
  fusion (round 2).
- ``pallas_egnn``: monolithic per-item EGNN layer/stack kernel — loses to
  XLA fusion (round 2).
- ``pallas_stack``: whole-stack single-program kernel — -1.25 ms/step vs
  the production mega kernel (round 3, "one-hot rebuild tax" experiment).

The production TPU path is ``ops/pallas_mega.py`` (aggregation 'auto' ->
'mega' in training) with ``ops/pallas_edge.py`` ('fused') as the prior
generation. Nothing here is imported by production code paths except via
the explicit opt-in aggregation modes that name them.
"""
