"""Offline jobs: artifact-producing batch entry points (quantizer fits
and similar publish-once-consume-many steps) that run outside the
query catalog."""
