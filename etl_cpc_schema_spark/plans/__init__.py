"""End-to-end pipeline assemblies (one lazy plan per pipeline)."""
