"""Rigid-body mini-sim demo."""
