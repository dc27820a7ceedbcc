"""Ray Data pipeline stages.

Each stage is either a stateless ``map_batches`` function (Arrow in/out) or
a callable class run as an actor pool (state in ``__init__``). Stages never
call ``ray.init``; they are composed by :mod:`ccnerx_ray.pipelines`.
"""
