"""CLI: MAP inference with fixed pairwise + budget potentials
(reference train_syn_fixed_pw_hop.py)."""

from .synthetic import parse_args, train_and_eval


def main(argv=None):
    return train_and_eval("fixed", parse_args(argv, "fixed"))


if __name__ == "__main__":
    main()
