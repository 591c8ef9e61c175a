"""Pinned numpy-twin golden for the kg_sgns_loss query (generated
by scripts/gen_sgns_golden.py against sf0.01 -- do not edit by
hand; regenerate instead)."""

# 307 vocab, 866 pairs, d=8, epochs=3, lr=0.05, neg=2
SGNS_LOSSES = [
    (0, 1800.840903),
    (1, 1800.236795),
    (2, 1799.582598),
]

# link-prediction AUC over the training rows, init vs after
# 3 epochs (tie-aware Mann-Whitney)
SGNS_AUC = [
    ('init', 0.493071),
    ('trained', 0.692484),
]
