"""Serving layer: the reference's REST API surface over the Spark engine."""
