"""Shared utilities: profiling, visualization, checkpoint IO."""
