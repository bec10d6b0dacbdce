"""Randomized-test helpers: TN generators and differential oracles."""
