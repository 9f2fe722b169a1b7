"""Neural networks: structured pose VAE, temporal transformer, checkpoint IO."""
