from .pipeline_jax import analyze_groups_jax, make_analyze_fn  # noqa: F401
