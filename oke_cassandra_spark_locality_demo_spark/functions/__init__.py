"""Scalar function families (SURVEY §2.3 "Scalar functions")."""
