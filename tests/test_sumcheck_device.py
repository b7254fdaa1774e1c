"""Device sumcheck rounds vs host prover — exact transcript equivalence."""

import random

import pytest

from reef_tpu.backend import sumcheck as SC
from reef_tpu.ops import field as F
from reef_tpu.ops.limb import FQ as LFQ
from reef_tpu.ops.sumcheck_device import DeviceTableCache

f = F.FQ
RNG = random.Random(77)


@pytest.mark.slow
def test_device_rounds_match_host():
    ell, m = 3, 4
    table = [RNG.randrange(f.p) for _ in range(1 << ell)]
    qs = [RNG.randrange(len(table)) for _ in range(m)]
    qs[1] = qs[0]  # duplicate row exercises host pre-combination
    vs = [table[q] for q in qs]
    prev_q = [RNG.randrange(f.p) for _ in range(ell)]
    prev_v = SC.verifier_mle_eval(f, table, prev_q)

    host = SC.nlookup_prove(f, table, qs, vs, prev_q, prev_v, "nl")
    cache = DeviceTableCache(LFQ, table)
    dev = SC.nlookup_prove(f, table, qs, vs, prev_q, prev_v, "nl",
                           device_cache=cache)

    assert dev.claim_r == host.claim_r
    assert dev.sc_rs == host.sc_rs
    assert dev.g_coeffs == host.g_coeffs
    assert dev.last_claim == host.last_claim
    assert dev.next_running_v == host.next_running_v
    assert SC.nlookup_verify_claim(f, dev, qs, vs, prev_q, prev_v)
