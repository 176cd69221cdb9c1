"""End-to-end query plans (domain pipeline, parity queries, operator inventory)."""
