"""Batch pipelines: bronze extraction, correlation state, silver, gold."""
