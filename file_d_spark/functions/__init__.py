"""Scalar/column function libraries shared by actions and queries."""
