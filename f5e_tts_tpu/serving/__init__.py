"""Serving runtimes: raw-socket streaming server, client, gRPC-style batcher."""
