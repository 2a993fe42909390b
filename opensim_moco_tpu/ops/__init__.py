"""Custom-kernel layer.

Empty by design, with receipts — see docs/PERF.md. On TPU v5e the
interior-point solve at Moco problem scales is bound by (a) matmul
accumulation precision (fixed by forcing full-f32 accumulation inside the
solver: 26->30/32 bench lanes, 2.7x throughput) and (b) per-op dispatch
latency of many small fused ops, not by any single hot loop a Pallas
kernel could win back: batched dense factorizations of bench-sized KKT
systems already run at ~0.05 ms (XLA), while one constraint-graph
evaluation costs ~2.8 ms. A hand kernel for the muscle-force chain was
prototyped in round 2-3 and measured irrelevant (<5% of an iteration);
keeping dead kernels in-tree costs more than it signals.
"""
