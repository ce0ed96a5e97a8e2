"""Multi-chip execution: device meshes, ray sharding, collectives."""
