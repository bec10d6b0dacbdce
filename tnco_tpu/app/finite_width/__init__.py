"""Finite-width application drivers."""
