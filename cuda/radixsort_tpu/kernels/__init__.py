"""Pallas TPU kernel layer: histogram, spine scan, stable scatter, hash, filter."""
