from .rollup import hourly_rollup_stream, politeness_rate_limit_stream

__all__ = ["hourly_rollup_stream", "politeness_rate_limit_stream"]
