"""Experiment drivers reproducing the reference entry points."""
