"""Pinned numpy-twin golden for the kg_spectral query (generated
by scripts/gen_spectral_golden.py against sf0.01 -- do not edit by
hand; regenerate instead)."""

# 307 nodes, 866 edges, r=8 Rademacher components
SPECTRAL_8 = [
    (0, 14.002109),
    (1, 8.716198),
    (2, 5.216715),
    (3, 3.649187),
    (4, 1.985501),
    (5, 1.07064),
    (6, 0.268208),
    (7, 0.105187),
]
