"""CLI: MAP inference with learned pairwise + budget (hop) factors
(reference train_syn_hop_factor.py)."""

from .synthetic import parse_args, train_and_eval


def main(argv=None):
    return train_and_eval("hop", parse_args(argv, "hop"))


if __name__ == "__main__":
    main()
