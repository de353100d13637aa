"""Pluggable crawl-notification sink (SURVEY §2.1-S13).

The reference posts a per-crawl text report to a chat webhook
(dataPipelines/notification/slack.py:6-49: JSON {channel, text} POST, gated
on a should-send flag, printing the payload when sending is off). That is a
side-effecting sink with exactly one interesting contract — "format the
run's metrics as a message and hand it to a transport" — so here the
transport is an interface:

  - LogNotifier        capture/print (default; what CI uses)
  - WebhookNotifier    generic JSON POST, endpoint injected by the caller;
                       no endpoint is baked in, and when disabled it prints
                       instead of sending (reference slack.py:30-31 parity)

CrawlEngine.run() calls notifier.notify(...) once per run with the stats it
already returns; formatting mirrors the reference's crawl report (one line
per source with scraped/deduped/dead counters)."""

from __future__ import annotations

import json


def format_crawl_report(stats: list[dict]) -> str:
    """One line per batch: the counters GCSpider logs at close
    (GCSpider.py:51-66 'scraped N items, M in previous hashes...')."""
    lines = ["crawl report"]
    for st in stats:
        lines.append(
            "batch {batch}: scheduled {scheduled}, new links {new_links}, "
            "docs {docs}, in previous hashes {in_previous_hashes}, dead {dead}".format(
                **{k: st.get(k, 0) for k in (
                    "batch", "scheduled", "new_links", "docs",
                    "in_previous_hashes", "dead",
                )}
            )
        )
    return "\n".join(lines)


class Notifier:
    def notify(self, message: str) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class LogNotifier(Notifier):
    """Collects messages (and optionally prints) — the CI-safe default."""

    def __init__(self, echo: bool = False):
        self.messages: list[str] = []
        self.echo = echo

    def notify(self, message: str) -> None:
        self.messages.append(message)
        if self.echo:
            print(message)


class WebhookNotifier(Notifier):
    """Generic JSON webhook POST — transport twin of slack.py:6-49. The
    endpoint/channel come from the caller; `enabled=False` (the default)
    prints the payload instead of sending, like the reference when its
    send flag is unset."""

    def __init__(self, url: str | None = None, channel: str | None = None, enabled: bool = False):
        self.url = url
        self.channel = channel
        self.enabled = enabled
        self.sent: list[bytes] = []

    def notify(self, message: str) -> None:
        data = json.dumps({"channel": self.channel, "text": message}).encode("utf-8")
        if not (self.enabled and self.url):  # pragma: no branch
            print("notifications disabled, did not send:\n", data)
            return
        import urllib.request as urq  # pragma: no cover - external service

        req = urq.Request(
            url=self.url, method="POST", data=data,
            headers={"Content-Type": "application/json"},
        )
        urq.urlopen(url=req)
        self.sent.append(data)
