"""One-off (B, P) scaling probe for the walks-FW engine (VERDICT r2
item 4): proposals/s, applied/s and 60 s quality across replica/walk
counts at the defended update_slices=2, exchange-every-4 protocol.

Usage::

    python -m benchmarks.fw_scale_probe --cells 64:32,64:64,128:32,256:32
"""

import argparse
import json
import os


def main() -> None:
    platform = os.environ.get('TNCO_TPU_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='sycamore_fw')
    ap.add_argument('--seconds', type=float, default=60.0)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--engine', default='walks')
    ap.add_argument('--cells', default='64:32,64:64,128:32,256:32',
                    help='comma list of replicas:n_walks cells')
    ap.add_argument('--update-slices', type=int, default=2)
    ap.add_argument('--exchange-every', type=int, default=4)
    ap.add_argument('--on-block', default=None)
    ap.add_argument('--accept-rule', default=None,
                    help="'round' | 'chained' (round-4 running-total "
                         "acceptance); comma list runs both per cell.")
    args = ap.parse_args()

    from benchmarks.quality import run_quality

    rules = (args.accept_rule or 'None').split(',')
    for cell in args.cells.split(','):
        b, p = (int(x) for x in cell.split(':'))
        for rule in rules:
            rule = None if rule in ('None', '') else rule
            res = run_quality(args.config, args.seconds, args.seed,
                              n_tpu_replicas=b, n_cpu_replicas=0,
                              engine=args.engine, n_walks=p,
                              update_slices=args.update_slices,
                              exchange_every=args.exchange_every,
                              on_block=args.on_block, accept_rule=rule)
            res.pop('tpu_curve', None)
            res.pop('cpu_curve', None)
            res['cell'] = {'replicas': b, 'n_walks': p,
                           'accept_rule': rule,
                           'on_block': args.on_block}
            res['proposals_per_s'] = (res['tpu_moves'] /
                                      res['tpu_time_s'])
            if res.get('tpu_applied'):
                res['applied_per_s'] = (res['tpu_applied'] /
                                        res['tpu_time_s'])
            print(json.dumps(res), flush=True)


if __name__ == '__main__':
    main()
