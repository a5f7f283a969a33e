from .tokens import recompute_n_tok, validate_envelopes

__all__ = ["recompute_n_tok", "validate_envelopes"]
