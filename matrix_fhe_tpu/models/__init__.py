from . import rng, encoder, batched_encoder, he, trace  # noqa: F401
