"""Utilities: testing fixtures, checkpoint IO, torch conversion, profiling."""
