"""Feature pipelines (the reference's DataSource/Transformation layer)."""
