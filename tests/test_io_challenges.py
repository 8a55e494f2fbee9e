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


def test_ks_hint_roundtrip_functional(rng):
    """Serialized+deserialized quad keyswitch hint relinearizes a real
    product ciphertext to the same plaintext (Lol Protoable KSHint)."""
    from lol_tpu import gadget as gd

    params = she.SHEParams(m=32, p=17, qs=QS, var=3.0)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    sk = she.gen_sk(params, k1)
    hint = she.ks_quad_circ_hint(sk, gd.RnsGad(), k2)
    back = lio.ks_hint_from_proto(
        lio.ks_hint_to_proto(hint).__class__.FromString(
            lio.ks_hint_to_proto(hint).SerializeToString()
        )
    )
    assert back.spec == hint.spec and back.ctx == hint.ctx
    m1, m2 = she.pt_random(params, rng), she.pt_random(params, rng)
    prod = she.ct_mul(she.encrypt(sk, m1, k3), she.encrypt(sk, m2, k4))
    np.testing.assert_array_equal(
        she.decrypt(sk, she.key_switch_quad_circ(back, prod)),
        she.decrypt(sk, she.key_switch_quad_circ(hint, prod)),
    )


def test_ks_hint_ext_roundtrip_functional(rng):
    """Serialized+deserialized extended-modulus hint (both kinds ride
    the same message) relinearizes / re-encrypts identically."""
    from lol_tpu import gadget as gd
    from lol_tpu import numtheory as nt
    from lol_tpu.proto import lol_pb2 as pb

    all5 = tuple(nt.ntt_primes(32, 30, 5))
    params = she.SHEParams(m=32, p=17, qs=all5[:3], var=3.0)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(17), 4)
    sk = she.gen_sk(params, k1)
    hint = she.ks_quad_circ_hint_ext(sk, gd.RnsGad(), k2, all5[3:])
    wire = lio.ks_hint_ext_to_proto(hint).SerializeToString()
    back = lio.ks_hint_ext_from_proto(pb.KSHintExt.FromString(wire))
    assert back.ctx_ext == hint.ctx_ext
    assert back.n_special == hint.n_special
    m1, m2 = she.pt_random(params, rng), she.pt_random(params, rng)
    prod = she.ct_mul(she.encrypt(sk, m1, k3), she.encrypt(sk, m2, k4))
    ref = she.key_switch_quad_circ_ext(hint, prod)
    got = she.key_switch_quad_circ_ext(back, prod)
    for comp in range(2):
        np.testing.assert_array_equal(
            np.asarray(got.cs[comp].to_crt().data),
            np.asarray(ref.cs[comp].to_crt().data),
        )


def test_tunnel_hint_and_ct_encoding_roundtrip(rng):
    """TunnelHint survives proto round-trip and tunnels identically; the
    ciphertext encoding tag (MSD|LSD) round-trips."""
    from lol_tpu import gadget as gd

    pr = she.SHEParams(m=32, p=17, qs=QS, var=2.0)
    ps = she.SHEParams(m=16, p=17, qs=QS, var=2.0)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(8), 4)
    sk_r, sk_s = she.gen_sk(pr, k1), she.gen_sk(ps, k2)
    s_ctx, e_ctx = ps.ctx, ring_context(16, QS)
    d = pr.ctx.n // e_ctx.n
    ys = [Cyc.zero(s_ctx) for _ in range(d)]
    ys[0] = Cyc.scalar(s_ctx, 1)
    f = lin.linear_pow(e_ctx, pr.ctx, s_ctx, ys)
    th = she.tunnel_hint(f, sk_s, sk_r, gd.RnsGad(), k3)
    wire = lio.tunnel_hint_to_proto(th).SerializeToString()
    from lol_tpu.proto import lol_pb2 as pb

    back = lio.tunnel_hint_from_proto(pb.TunnelHint.FromString(wire))
    m = she.pt_random(pr, rng)
    ct = she.encrypt(sk_r, m, k4)
    np.testing.assert_array_equal(
        she.decrypt(sk_s, she.tunnel(back, ct)),
        she.decrypt(sk_s, she.tunnel(th, ct)),
    )
    # encoding tag round-trip
    ct_msd = she.encrypt_msd(sk_r, m, k4)
    back_ct = lio.ct_from_proto(
        pb.SHECiphertext.FromString(lio.ct_to_proto(ct_msd).SerializeToString())
    )
    assert back_ct.encoding == "msd"
    np.testing.assert_array_equal(she.decrypt(sk_r, back_ct), m % pr.p)


def _write_v1_record(d, epoch: int, sig: bytes):
    import hashlib

    out = hashlib.sha512(sig).hexdigest().upper()
    (d / f"{epoch}.xml").write_text(
        "<record xmlns=\"http://beacon.nist.gov/record/0.1/\">"
        f"<timeStamp>{epoch}</timeStamp>"
        f"<signatureValue>{sig.hex().upper()}</signatureValue>"
        f"<outputValue>{out}</outputValue></record>"
    )
    return bytes.fromhex(out)


def test_nist_record_beacon_v1_and_v2(tmp_path):
    import hashlib
    import json

    from lol_tpu.challenges.beacon import NistRecordBeacon

    sig = bytes(range(256))
    want = _write_v1_record(tmp_path, 1400000000, sig)
    # v2 json record for another epoch
    out2 = hashlib.sha512(b"pulse").hexdigest()
    (tmp_path / "1500000000.json").write_text(
        json.dumps({"pulse": {"timeStamp": "t", "outputValue": out2}})
    )
    b = NistRecordBeacon(tmp_path)
    assert b.record(1400000000) == want
    assert b.record(1500000000) == bytes.fromhex(out2)
    # bits() slices the 512-bit output like LocalBeacon does
    assert b.bits(1400000000, 0, 8) == want[0]
    with pytest.raises(FileNotFoundError):
        b.record(1234)


def test_nist_record_beacon_detects_corruption(tmp_path):
    from lol_tpu.challenges.beacon import NistRecordBeacon

    import hashlib

    good = _write_v1_record(tmp_path, 99, b"\x01" * 64).hex().upper()
    # tamper with outputValue: chain check outputValue==SHA512(sig) fails
    f = tmp_path / "99.xml"
    forged = hashlib.sha512(b"forged").hexdigest().upper()
    f.write_text(f.read_text().replace(good, forged))
    b = NistRecordBeacon(tmp_path)
    with pytest.raises(ValueError):
        b.record(99)


def test_challenges_suppress_verify_with_nist_beacon(tmp_path):
    from lol_tpu.challenges.beacon import NistRecordBeacon

    q = nt.ntt_primes(64, 30, 1)[0]
    recs = tmp_path / "records"
    recs.mkdir()
    _write_v1_record(recs, 42, b"beacon-sig")
    params = [ChallengeParams(0, 64, q, 4.0, 3, "disc", beacon_epoch=42)]
    generate(tmp_path / "out", params, seed=3)
    b = NistRecordBeacon(recs)
    suppress(tmp_path / "out", beacon=b)
    assert len(list((tmp_path / "out" / "chall-id0000").glob("*.secret"))) == 2
    assert verify(tmp_path / "out", beacon=b) is True
    # a different beacon record picks (in general) a different survivor:
    # verifying against the WRONG beacon must fail the consistency check
    recs2 = tmp_path / "records2"
    recs2.mkdir()
    _write_v1_record(recs2, 42, b"other-sig")
    b2 = NistRecordBeacon(recs2)
    keep1 = b.bits(42, 0, 2) % 3
    keep2 = b2.bits(42, 0, 2) % 3
    if keep1 != keep2:
        assert verify(tmp_path / "out", beacon=b2) is False


def test_pt_round_hints_bundle_roundtrip():
    """PTRoundHints (the rounding-hint aggregate a serving deployment
    checkpoints) round-trips through proto, and she.pt_round with the
    RELOADED bundle is bit-identical to the original."""
    from lol_tpu import gadget as gd

    p = 8
    qs = tuple(nt.ntt_primes(32, 30, she.pt_round_mults(p) + 2))
    params = she.SHEParams(m=16, p=p, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(30))
    rh = she.pt_round_hints(sk, gd.RnsGad(), jax.random.PRNGKey(31))
    wire = lio.pt_round_hints_to_proto(rh).SerializeToString()
    back = lio.pt_round_hints_from_proto(lio.pb.PTRoundHints.FromString(wire))
    assert len(back.hints) == len(rh.hints)
    m = np.zeros(params.ctx.n, dtype=np.int64)
    m[0] = 5
    ct = she.encrypt(sk, m, jax.random.PRNGKey(32))
    ref = she.pt_round(ct, rh)
    got = she.pt_round(ct, back)
    assert got.f == ref.f and got.params.p == ref.params.p
    for a, b in zip(got.cs, ref.cs):
        np.testing.assert_array_equal(
            np.asarray(a.to_crt().data), np.asarray(b.to_crt().data)
        )


@pytest.mark.parametrize("homomorphic_round", [False, True])
def test_eval_hints_bundle_roundtrip(rng, homomorphic_round):
    """EvalHints (tunnel chain + optional rounding bundle) round-trips
    through proto with the rounds-presence bit preserved, and
    prf.homom_prf_component with the RELOADED bundle is bit-identical."""
    from lol_tpu import gadget as gd
    from lol_tpu import prf

    p = 8
    qs = tuple(nt.ntt_primes(64, 30, 6))
    fam = prf.PRFFamily.random(ring_context(32, (p,)), gd.BaseBGad(2),
                               prf.balanced(3), jax.random.PRNGKey(40))
    pr_params = she.SHEParams(m=32, p=p, qs=qs, var=2.0)
    ps_params = she.SHEParams(m=2, p=p, qs=qs, var=2.0)
    k1, k2, kh, ke = jax.random.split(jax.random.PRNGKey(41), 4)
    sk_r = she.gen_sk(pr_params, k1)
    sk_s = she.gen_sk(ps_params, k2)
    hints, sk_out = prf.make_eval_hints(
        fam, [sk_r, sk_s], [32, 2], [2], gd.RnsGad(), kh, p_final=2,
        homomorphic_round=homomorphic_round, maps="project",
    )
    wire = lio.eval_hints_to_proto(hints).SerializeToString()
    back = lio.eval_hints_from_proto(lio.pb.EvalHints.FromString(wire))
    assert back.p_final == hints.p_final
    assert (back.rounds is None) == (hints.rounds is None)
    assert len(back.tunnels) == len(hints.tunnels)
    m_s = rng.integers(0, p, pr_params.ctx.n).astype(np.int64)
    ct = she.encrypt(sk_r, m_s, ke)
    bits = (1, 0, 1)
    ref = prf.homom_prf_component(fam, hints, ct, bits, 0)
    got = prf.homom_prf_component(fam, back, ct, bits, 0)
    assert got.f == ref.f and got.params.p == ref.params.p
    for a, b in zip(got.cs, ref.cs):
        np.testing.assert_array_equal(
            np.asarray(a.to_crt().data), np.asarray(b.to_crt().data)
        )
    np.testing.assert_array_equal(
        she.decrypt(sk_out, got), she.decrypt(sk_out, ref)
    )
