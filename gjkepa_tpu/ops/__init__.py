"""Compute ops for the TPU collision engine."""
