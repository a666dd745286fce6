"""Engine operators: CDC apply, dedup, similarity, text, multimodal."""
