"""CLI: MAP inference with learned pairwise factors
(reference train_syn_pw_factor.py)."""

from .synthetic import parse_args, train_and_eval


def main(argv=None):
    return train_and_eval("pw", parse_args(argv, "pw"))


if __name__ == "__main__":
    main()
