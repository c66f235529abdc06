"""Headless analogs of the reference's ui/ layer: live capture and
per-stage calibration visualization (no Qt — files instead of windows)."""
