"""Keep the driver entry points green: the multichip dryrun must compile and
execute the full train step + sampler over the 8-device CPU mesh."""

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(min(8, jax.device_count()))
