"""Physics model components: sources, clumping, LLS, N-body problem adapters."""
