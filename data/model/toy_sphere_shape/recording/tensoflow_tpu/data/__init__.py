"""Datasets: scene databases, ray-batch construction, toy synthetic scenes."""
