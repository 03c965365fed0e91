"""genbook / writebook commands (cpp/command/genbook.cpp, main.cpp:139-150).

Usage:
  python -m katago_tpu.cli.book_cmd genbook -book book.json [-model M]
      [-config b6c96] [-size 19] [-visits 64] [-rounds 4]
  python -m katago_tpu.cli.book_cmd writebook -book book.json -out-dir html/
  python -m katago_tpu.cli.book_cmd checkbook -book book.json
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from katago_tpu.book.book import Book, gen_book


def _load_model(args, size):
    if args.model:
        from katago_tpu.models import desc as D
        net = D.load_model(args.model)
        return D.make_desc_apply(net), None
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    cfg = MC.get_config(args.config)
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)), jnp.zeros((1, 19)))
    return (lambda p, s, g: model.apply(params, s, g)), None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=["genbook", "writebook", "checkbook"])
    ap.add_argument("-book", required=True)
    ap.add_argument("-out-dir", default=None)
    ap.add_argument("-model", default=None)
    ap.add_argument("-config", default="b6c96")
    ap.add_argument("-size", type=int, default=19)
    ap.add_argument("-visits", type=int, default=64)
    ap.add_argument("-rounds", type=int, default=4)
    ap.add_argument("-nodes-per-round", type=int, default=8)
    ap.add_argument("-book-config", default=None,
                    help="reference-keyed genbook cfg with BookParams "
                         "(errorFactor, costPerMove, ... — "
                         "configs/book/genbook7jp.cfg:23-40)")
    args = ap.parse_args(argv)

    if args.command == "genbook":
        book = Book.load(args.book) if os.path.exists(args.book) else None
        size = book.size if book else args.size
        apply_fn, params = _load_model(args, size)
        book_params = None
        if args.book_config:
            from katago_tpu.book.book import BookParams
            from katago_tpu.utils.config_parser import ConfigParser
            cfg = ConfigParser(args.book_config)
            book_params = BookParams.from_config(
                {k: cfg.get_string(k) for k in BookParams._CFG_KEYS
                 if cfg.contains(k)})
        book = gen_book(apply_fn, params, size=size, visits=args.visits,
                        rounds=args.rounds,
                        nodes_per_round=args.nodes_per_round, book=book,
                        book_params=book_params)
        book.save(args.book)
        print(json.dumps({"nodes": len(book.nodes), "book": args.book}))
    elif args.command == "writebook":
        book = Book.load(args.book)
        out = args.out_dir or (args.book + ".html")
        book.write_html(out)
        print(json.dumps({"nodes": len(book.nodes), "out_dir": out}))
    else:  # checkbook
        book = Book.load(args.book)
        dangling = sum(1 for n in book.nodes.values()
                       for m in n.moves.values()
                       if m.child_hash not in book.nodes)
        print(json.dumps({"nodes": len(book.nodes), "dangling": dangling,
                          "root": book.root_hash}))


if __name__ == "__main__":
    main()
