"""Pipeline compositions: the KG-construction flagship and its
single-process conformance oracle. No module here calls ``ray.init``."""
