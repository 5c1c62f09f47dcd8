"""SMTP email sink — twin of the reference's MIME assembly + SMTP-SSL
send (tabjolt_email.py:124-343). Message construction is pure stdlib
and fully testable; the network send is isolated behind
:func:`send`, which callers invoke only with real SMTP config.
"""

from __future__ import annotations

import os
import smtplib
from email.mime.image import MIMEImage
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText


def build_message(
    subject: str,
    sender: str,
    recipients: list[str],
    html_body: str,
    chart_path: str | None = None,
    chart_cid: str = "graph_cid",
) -> MIMEMultipart:
    """HTML body + optional inline PNG referenced by Content-ID
    (tabjolt_email.py:329-333)."""
    msg = MIMEMultipart()
    msg["From"] = sender
    msg["To"] = ", ".join(recipients)
    msg["Subject"] = subject
    msg.attach(MIMEText(html_body, "html"))
    if chart_path and os.path.exists(chart_path):
        with open(chart_path, "rb") as f:
            img = MIMEImage(f.read())
        img.add_header("Content-ID", f"<{chart_cid}>")
        img.add_header(
            "Content-Disposition", "inline",
            filename=os.path.basename(chart_path),
        )
        msg.attach(img)
    return msg


def send(msg: MIMEMultipart, smtp_config: dict) -> None:
    """SMTP-SSL send (tabjolt_email.py:335-343). Network side effect —
    only called with explicit config; never in tests."""
    server = smtplib.SMTP_SSL(
        smtp_config["smtp_server"], smtp_config["smtp_port"]
    )
    try:
        server.login(smtp_config["smtp_username"], smtp_config["smtp_password"])
        server.sendmail(
            msg["From"], msg["To"].split(", "), msg.as_string()
        )
    finally:
        server.quit()
