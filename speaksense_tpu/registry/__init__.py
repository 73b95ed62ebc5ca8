"""Service registry (reference src/registry/): the Registry interface and a
go-micro-compatible etcd implementation."""

from speaksense_tpu.registry.etcd import EtcdRegistry, Registry  # noqa: F401
