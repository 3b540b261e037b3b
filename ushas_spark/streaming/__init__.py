"""Structured Streaming operators (SURVEY.md section 2.9)."""
