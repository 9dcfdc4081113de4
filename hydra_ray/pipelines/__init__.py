"""End-to-end pipeline drivers (epoch loops over the streaming operators)."""
