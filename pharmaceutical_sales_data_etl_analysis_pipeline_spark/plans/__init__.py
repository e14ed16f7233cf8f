"""Pipeline DAGs composing operators into the reference's end-to-end flows."""
