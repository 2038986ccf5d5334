"""Ray Data stage builders. Each stage is a thin adapter from the pure
kernels/extract_core to ``map_batches``/``flat_map``/``groupby`` — no
semantics live here."""
