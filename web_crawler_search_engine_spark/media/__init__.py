"""Audio/video multimodal-column support (codec + Arrow UDFs)."""
