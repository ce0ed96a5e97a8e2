"""Evaluation: metrics, testers, mesh/material export, relighting bridge."""
