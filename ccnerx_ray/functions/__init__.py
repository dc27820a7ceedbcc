"""Pure, stateless scalar/sequence functions used inside map_batches UDFs."""
