"""Serving stack: gRPC bidi-streaming ASR (:7300), REST task/auth API
(:7200), etcd registry — the reference's L6/L7 layers (SURVEY.md §1), with
the same wire contracts."""
