"""Serialization round-trips + challenges end-to-end (SURVEY §5.4:
'challenge verifier as an end-to-end test')."""

import numpy as np
import jax
import pytest

from lol_tpu import io as lio
from lol_tpu import linear as lin
from lol_tpu import numtheory as nt, she
from lol_tpu.challenges import LocalBeacon, generate, suppress, verify
from lol_tpu.challenges.driver import ChallengeParams, main
from lol_tpu.cyc import Cyc
from lol_tpu.ring import ring_context

QS = tuple(nt.ntt_primes(512, 30, 2))


def test_cyc_proto_roundtrip(rng):
    ctx = ring_context(64, QS)
    c = Cyc.from_ints(ctx, rng.integers(-50, 50, ctx.n)).to_crt()
    msg = lio.cyc_to_proto(c)
    c2 = lio.cyc_from_proto(lio.pb.Rq.FromString(msg.SerializeToString()))
    assert c2.ctx == ctx and c2.rep == c.rep
    assert c2 == c


def test_sk_ct_proto_roundtrip(rng):
    params = she.SHEParams(m=64, p=257, qs=QS, var=4.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(0))
    m = she.pt_random(params, rng)
    ct = she.encrypt(sk, m, jax.random.PRNGKey(1))
    sk2 = lio.sk_from_proto(
        lio.pb.SecretKey.FromString(lio.sk_to_proto(sk).SerializeToString())
    )
    ct2 = lio.ct_from_proto(
        lio.pb.SHECiphertext.FromString(lio.ct_to_proto(ct).SerializeToString())
    )
    np.testing.assert_array_equal(sk2.s_ints, sk.s_ints)
    np.testing.assert_array_equal(she.decrypt(sk2, ct2), m)


def test_linear_proto_roundtrip(rng):
    E, R, S = (ring_context(m, QS) for m in (16, 32, 64))
    ys = [Cyc.from_ints(S, rng.integers(-5, 5, S.n)) for _ in range(2)]
    f = lin.linear_pow(E, R, S, ys)
    f2 = lio.linear_from_proto(
        lio.pb.LinearRq.FromString(lio.linear_to_proto(f).SerializeToString())
    )
    x = Cyc.from_ints(R, rng.integers(-9, 9, R.n))
    assert lin.eval_lin(f2, x).to_pow() == lin.eval_lin(f, x).to_pow()


@pytest.fixture
def chall_root(tmp_path):
    q = nt.ntt_primes(64, 30, 1)[0]
    params = [
        ChallengeParams(0, 64, q, 4.0, 3, "disc", beacon_epoch=11, beacon_offset=0),
        ChallengeParams(1, 64, q, 4.0, 2, "cont", beacon_epoch=12, beacon_offset=8),
        ChallengeParams(2, 64, q, 4.0, 2, "rlwr", qprime=257, beacon_epoch=13),
    ]
    generate(tmp_path, params, seed=7)
    return tmp_path


def test_challenges_generate_suppress_verify(chall_root):
    root = chall_root
    dirs = sorted(root.glob("chall-id*"))
    assert len(dirs) == 3
    assert len(list(dirs[0].glob("*.instance"))) == 3
    assert len(list(dirs[0].glob("*.secret"))) == 3
    # verify before suppress: flags held-out secret still present
    assert verify(root) is False
    suppress(root)
    # exactly one secret per challenge deleted
    assert len(list(dirs[0].glob("*.secret"))) == 2
    assert verify(root) is True


def test_challenges_verify_catches_corruption(chall_root):
    root = chall_root
    suppress(root)
    # corrupt one revealed secret: flip a coefficient
    from lol_tpu.proto import lol_pb2 as pb

    f = sorted(root.glob("chall-id0000/*.secret"))[0]
    sec = pb.Secret.FromString(f.read_bytes())
    sec.s.coeffs[0] += 1000
    f.write_bytes(sec.SerializeToString())
    assert verify(root) is False


def test_challenges_cli(tmp_path, capsys):
    q = nt.ntt_primes(64, 30, 1)[0]
    pfile = tmp_path / "params.txt"
    pfile.write_text(f"# id m q svar num kind\n0 64 {q} 4.0 2 disc\n")
    root = tmp_path / "out"
    assert main(["generate", str(root), "--params", str(pfile)]) == 0
    assert main(["suppress", str(root)]) == 0
    assert main(["verify", str(root)]) == 0
