"""Preprocessing estimators: fit on train split → small model state →
pure-expression transforms (SURVEY §3 E2, §7 steps 5-6)."""
