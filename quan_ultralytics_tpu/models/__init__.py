"""Flax model components: quaternion layers, blocks, heads, YAML compiler."""
