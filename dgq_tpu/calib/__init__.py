"""Calibration layer: weight scale init + folding, AdaRound reconstruction,
activation (group / time-aware) calibration."""
