"""Pipeline plans: staged, checkpointed, resumable execution."""
