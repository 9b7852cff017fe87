"""Command-line physics executables — the analogue of the reference's
qkxtm/ binaries (CalcMG_2pt3pt_EvenOdd, CalcMG_Loops_w_oneD_TSM_EvenOdd,
CalcMG_Loops_w_oneD_TSM_wExact; flags parsed in qkxtm/QKXTM_util.cpp and
tests/test_util.cpp).

Usage:
    python -m quda_qkxtm_multigrid_tpu.cli twop  --xdim 8 --ydim 8 ... \
        --kappa 0.115 --mu 0.005 --csw 1.57 --conf conf.lime --src 0,0,0,0
    python -m quda_qkxtm_multigrid_tpu.cli threep ... --tsink 12 --proj G4
    python -m quda_qkxtm_multigrid_tpu.cli loops ... --nstoch 12
Flag names follow the reference CLI where meaningful (--xdim/--kappa/
--mu/--csw/--Q-sq/--src/--nsmearAPE/--alphaAPE/--nsmearGauss/--alphaGauss,
reference QKXTM_util.cpp).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _common(p):
    p.add_argument("--xdim", type=int, default=8)
    p.add_argument("--ydim", type=int, default=8)
    p.add_argument("--zdim", type=int, default=8)
    p.add_argument("--tdim", type=int, default=16)
    p.add_argument("--kappa", type=float, required=True)
    p.add_argument("--mu", type=float, required=True)
    p.add_argument("--csw", type=float, default=0.0)
    p.add_argument("--conf", type=str, default=None,
                   help="ILDG/LIME gauge configuration (random if omitted)")
    p.add_argument("--traj", type=int, default=0)
    p.add_argument("--Q-sq", dest="q_sq", type=int, default=1)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--maxiter", type=int, default=2000)
    p.add_argument("--nsmearAPE", type=int, default=20)
    p.add_argument("--alphaAPE", type=float, default=0.5)
    p.add_argument("--nsmearGauss", type=int, default=50)
    p.add_argument("--alphaGauss", type=float, default=4.0)
    p.add_argument("--precision", choices=["single", "double"],
                   default="single")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--output", type=str, default="out")
    # MG flags (reference names where they exist: multigrid_invert_test
    # --mg-* family, CalcMG executables' delta knobs quda.h:401-407)
    p.add_argument("--mg", action="store_true",
                   help="solve with MG-preconditioned GCR")
    p.add_argument("--mg-block", type=str, default="4,4,4,4")
    p.add_argument("--mg-nvec", type=int, default=24)
    p.add_argument("--mg-levels", type=int, default=2)
    p.add_argument("--mg-setup-tol", type=float, default=5e-6)
    p.add_argument("--mg-setup-maxiter", type=int, default=500)
    p.add_argument("--mg-nu-pre", type=int, default=0)
    p.add_argument("--mg-nu-post", type=int, default=4)
    p.add_argument("--mg-solver", choices=["gcr", "gcr-pc",
                                           "mr-richardson"],
                   default="gcr",
                   help="MG outer: gcr-pc = the reference production "
                        "DIRECT_PC path (outer Krylov on the Schur "
                        "system)")
    p.add_argument("--mg-load-vecs", dest="mg_vec_infile", type=str,
                   default="", help="load null vectors (vec_infile, "
                                    "quda.h:389-393) — skips setup "
                                    "generation")
    p.add_argument("--mg-save-vecs", dest="mg_vec_outfile", type=str,
                   default="", help="save null vectors after setup "
                                    "(vec_outfile)")
    p.add_argument("--delta-muPR", dest="delta_mu_pr", type=float,
                   default=1.0)
    p.add_argument("--delta-kappaPR", dest="delta_kappa_pr", type=float,
                   default=1.0)
    p.add_argument("--delta-cswPR", dest="delta_csw_pr", type=float,
                   default=1.0)
    p.add_argument("--delta-muCG", dest="delta_mu_coarse", type=float,
                   default=1.0)
    p.add_argument("--delta-kappaCG", dest="delta_kappa_coarse",
                   type=float, default=1.0)
    p.add_argument("--delta-cswCG", dest="delta_csw_coarse", type=float,
                   default=1.0)


def _mg_params(args):
    if not args.mg:
        return None
    from quda_qkxtm_multigrid_tpu.mg.multigrid import MGParams
    bx, by, bz, bt = (int(v) for v in args.mg_block.split(","))
    return MGParams(block=(bx, by, bz, bt), nvec=args.mg_nvec,
                    outer_solver=args.mg_solver,
                    n_level=args.mg_levels, setup_tol=args.mg_setup_tol,
                    setup_maxiter=args.mg_setup_maxiter,
                    nu_pre=args.mg_nu_pre, nu_post=args.mg_nu_post,
                    smoother_pc=True,
                    vec_infile=args.mg_vec_infile,
                    vec_outfile=args.mg_vec_outfile,
                    delta_mu_pr=args.delta_mu_pr,
                    delta_kappa_pr=args.delta_kappa_pr,
                    delta_csw_pr=args.delta_csw_pr,
                    delta_mu_coarse=args.delta_mu_coarse,
                    delta_kappa_coarse=args.delta_kappa_coarse,
                    delta_csw_coarse=args.delta_csw_coarse)


def _load_gauge(args, geom, dtype):
    import jax
    import jax.numpy as jnp
    from quda_qkxtm_multigrid_tpu import fields
    from quda_qkxtm_multigrid_tpu.io import lime
    from quda_qkxtm_multigrid_tpu.ops.gauge import apply_t_boundary, plaquette
    from quda_qkxtm_multigrid_tpu.utils import rng

    if args.conf:
        full = lime.read_ildg_gauge(args.conf)
        u = fields.gauge_from_full(jnp.asarray(full, dtype), geom)
    else:
        u = jax.jit(lambda k: rng.random_gauge(k, geom, dtype))(
            jax.random.PRNGKey(args.seed))
    u = jax.jit(lambda u: apply_t_boundary(u, geom))(u)
    tot, sp, tm = jax.jit(lambda u: plaquette(u, geom))(u)
    print(f"plaquette: total={float(tot):.8f} spatial={float(sp):.8f} "
          f"temporal={float(tm):.8f}")
    return u


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from quda_qkxtm_multigrid_tpu import enable_compile_cache
    enable_compile_cache()

    parser = argparse.ArgumentParser(prog="quda_qkxtm_multigrid_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("twop", "threep", "loops"):
        sp = sub.add_parser(name)
        _common(sp)
        if name in ("twop", "threep"):
            sp.add_argument("--src", type=str, default="0,0,0,0",
                            help="source position x,y,z,t")
        if name == "threep":
            sp.add_argument("--tsink", type=int, required=True)
            sp.add_argument("--proj", type=str, default="G4",
                            help="comma list of G4,G5G123,G5G1,G5G2,G5G3")
        if name == "loops":
            sp.add_argument("--nstoch", type=int, default=12)
            sp.add_argument("--tol-LP", dest="tol_lp", type=float,
                            default=None)
            sp.add_argument("--nHP", dest="n_hp", type=int, default=0)
    args = parser.parse_args(argv)

    from quda_qkxtm_multigrid_tpu.lattice import Geometry
    from quda_qkxtm_multigrid_tpu import workflows as wf

    dtype = jnp.complex128 if args.precision == "double" else jnp.complex64
    if args.precision == "double":
        jax.config.update("jax_enable_x64", True)
    geom = Geometry(args.xdim, args.ydim, args.zdim, args.tdim)
    u = _load_gauge(args, geom, dtype)

    if args.cmd == "twop":
        src = tuple(int(v) for v in args.src.split(","))
        out = wf.run_twop(u, geom, args.kappa, args.mu, args.csw,
                          source=src, q_sq_max=args.q_sq,
                          ape_alpha=args.alphaAPE, ape_n=args.nsmearAPE,
                          gauss_alpha=args.alphaGauss, gauss_n=args.nsmearGauss,
                          tol=args.tol, maxiter=args.maxiter, verbose=True,
                          mg_params=_mg_params(args))
        try:
            from quda_qkxtm_multigrid_tpu.io import hdf5 as h5w
            h5w.write_twop_mesons_hdf5(f"{args.output}_mesons.h5",
                                       np.asarray(out["mesons"]),
                                       out["moms"], args.traj, src)
            h5w.write_twop_baryons_hdf5(f"{args.output}_baryons.h5",
                                        np.asarray(out["baryons"]),
                                        out["moms"], args.traj, src)
            print(f"wrote {args.output}_mesons.h5, {args.output}_baryons.h5")
        except ImportError:
            from quda_qkxtm_multigrid_tpu.io.hdf5 import write_twop_ascii
            write_twop_ascii(f"{args.output}_mesons.dat",
                             np.asarray(out["mesons"]), out["moms"], "mesons")
            print(f"wrote {args.output}_mesons.dat")
    elif args.cmd == "threep":
        src = tuple(int(v) for v in args.src.split(","))
        out2 = wf.run_twop(u, geom, args.kappa, args.mu, args.csw,
                           source=src, q_sq_max=args.q_sq,
                           ape_alpha=args.alphaAPE, ape_n=args.nsmearAPE,
                           gauss_alpha=args.alphaGauss,
                           gauss_n=args.nsmearGauss,
                           tol=args.tol, maxiter=args.maxiter, verbose=True,
                           mg_params=_mg_params(args))
        res = wf.run_threep(u, geom, args.kappa, args.mu, args.csw,
                            prop_up=out2["prop_up"], prop_dn=out2["prop_dn"],
                            u_ape=out2["u_ape"], tsink=args.tsink, source=src,
                            projectors=tuple(args.proj.split(",")),
                            q_sq_max=args.q_sq,
                            gauss_alpha=args.alphaGauss,
                            gauss_n=args.nsmearGauss,
                            tol=args.tol, maxiter=args.maxiter,
                            mg_pair=out2["mg_pair"])
        from quda_qkxtm_multigrid_tpu.io import hdf5 as h5w
        for proj, parts in res["thrp"].items():
            for part, types in parts.items():
                for ttype, arr in types.items():
                    h5w.write_threep_hdf5(
                        f"{args.output}_thrp.h5", np.asarray(arr),
                        res["moms"], args.traj, src, args.tsink, proj,
                        f"{ttype}_{part}", "proton")
        print(f"wrote {args.output}_thrp.h5")
    elif args.cmd == "loops":
        out = wf.run_loops(u, geom, args.kappa, args.mu, args.csw,
                           n_stoch=args.nstoch,
                           key=jax.random.PRNGKey(args.seed),
                           tol=args.tol, maxiter=args.maxiter,
                           tol_lp=args.tol_lp, n_hp=args.n_hp)
        from quda_qkxtm_multigrid_tpu.io import hdf5 as h5w
        from quda_qkxtm_multigrid_tpu.physics.contract import momentum_list
        moms = momentum_list(args.q_sq)
        # FFT grid → selected momenta
        sel = {}
        for name, arr in out.items():
            a = np.asarray(arr)
            sel[name] = np.stack(
                [a[..., pz, py, px] for (px, py, pz) in moms], axis=-1)
        h5w.write_loops_hdf5(f"{args.output}_loops.h5", sel, moms,
                             args.traj, args.nstoch)
        print(f"wrote {args.output}_loops.h5")


if __name__ == "__main__":
    main()
