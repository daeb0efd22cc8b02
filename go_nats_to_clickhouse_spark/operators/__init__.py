"""Relational + pipeline operators, expressed as DataFrame -> DataFrame
transforms so Catalyst plans (and re-plans, under AQE) every one of them."""
