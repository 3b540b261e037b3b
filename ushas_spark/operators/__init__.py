"""Scale-oriented data-pipeline operators (dedup, similarity, text, multimodal, as-of)."""
