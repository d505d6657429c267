"""End-to-end job composition."""
