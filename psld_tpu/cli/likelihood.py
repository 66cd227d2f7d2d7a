"""Dataset NLL (bits/dim) via the probability-flow ODE.

TPU-native extension beyond the reference CLI surface: the reference
implements ``prior_logp`` (vpsde.py:91-95) but ships no likelihood
pipeline. Usage mirrors the sample entry point:

    python -m psld_tpu.cli.likelihood +dataset=cifar10/cifar10_psld \
        dataset.diffusion.data.root=... \
        dataset.diffusion.evaluation.chkpt_path=... \
        [+dataset.diffusion.evaluation.likelihood.n_steps=100] \
        [+dataset.diffusion.evaluation.likelihood.solver=rk4] \
        [+dataset.diffusion.evaluation.likelihood.n_probes=1]

Prints and returns the mean bits/dim (exact for VP-SDE; CLD-style
variational upper bound for the augmented PSLD state).
"""

from psld_tpu.cli._common import bootstrap, console as _console


def main(argv=None):
    cfg = bootstrap(argv)
    from psld_tpu.eval.likelihood import evaluate_nll

    bpd = evaluate_nll(cfg.dataset.diffusion)
    print(f"nll: {bpd:.4f} bits/dim")
    return bpd


cli = _console(main)


if __name__ == "__main__":
    main()
