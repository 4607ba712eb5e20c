"""Durable run state: per-partition checkpoint manifests and drift baselines."""
