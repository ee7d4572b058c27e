"""Structured Streaming surface.

The reference is a batch loop over SQLite; the engine's crawl is a
deterministic batch-epoch driver (crawler.py) because crawl-order
equality vs the reference demands deterministic dequeues. This package
carries the genuinely-streaming operators: event-time windowed
aggregation with watermarks and stateful sessionization — the streaming
duals of queries q18/q19, checked for batch/stream equivalence in
tests/test_streaming.py.
"""
