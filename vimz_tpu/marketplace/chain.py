"""In-process chain simulator for the marketplace layer.

The reference runs its marketplace scenarios against a local Anvil node over
JSON-RPC (marketplace/run_scenario.sh:31-37, vimz_marketplace_sdk/chain.py:
26-150). This environment has no EVM toolchain, so the contract suite is
implemented twice:

- Solidity sources under contracts/ (artifacts, for on-chain deployment);
- this simulator: the same contract semantics in Python — same method
  names, revert strings and event logs — so the scenario suite and its
  negative tests (marketplace/scenarios/register_images.py:57-77) run
  hermetically, with REAL proof verification wired in.

Accounts are simple named actors with balances; signatures are modeled as
sha256(secret || message) tags over registered keys (the reference uses
ECDSA/ecrecover; the registration *logic* — who may sign what — is what the
scenarios exercise, and is preserved exactly).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field


class Revert(Exception):
    """Contract revert with the reason string (matched by negative tests)."""


@dataclass
class Account:
    name: str
    address: str
    balance: int = 10**20
    _secret: bytes = b""

    def sign(self, message: bytes) -> bytes:
        return hashlib.sha256(self._secret + message).digest()

    @property
    def public_key(self) -> bytes:
        return hashlib.sha256(b"pub" + self._secret).digest()


def verify_signature(public_key: bytes, message: bytes, signature: bytes, secret_hint=None) -> bool:
    # The simulator can't recover a key from a hash tag; contracts store the
    # signer's public key and the Chain keeps the secret registry.
    return Chain.current is not None and Chain.current._check_sig(
        public_key, message, signature
    )


@dataclass
class Event:
    contract: str
    name: str
    args: dict


class Chain:
    """A deterministic single-node 'chain': accounts, deploys, events."""

    current: "Chain | None" = None

    def __init__(self):
        self.accounts: dict[str, Account] = {}
        self.events: list[Event] = []
        self.contracts: dict[str, object] = {}
        self._nonce = 0
        Chain.current = self

    def account(self, name: str) -> Account:
        if name not in self.accounts:
            secret = hashlib.sha256(f"secret:{name}".encode()).digest()
            addr = "0x" + hashlib.sha256(f"addr:{name}".encode()).hexdigest()[:40]
            self.accounts[name] = Account(name=name, address=addr, _secret=secret)
        return self.accounts[name]

    def _check_sig(self, public_key: bytes, message: bytes, signature: bytes) -> bool:
        for acct in self.accounts.values():
            if acct.public_key == public_key:
                return acct.sign(message) == signature
        return False

    def deploy(self, contract) -> object:
        name = type(contract).__name__
        self._nonce += 1
        contract._chain = self
        contract._address = (
            "0x" + hashlib.sha256(f"contract:{name}:{self._nonce}".encode()).hexdigest()[:40]
        )
        self.contracts[f"{name}:{self._nonce}"] = contract
        return contract

    def emit(self, contract, name: str, **args):
        self.events.append(Event(type(contract).__name__, name, args))

    def transfer(self, frm: Account, to: Account, amount: int):
        if frm.balance < amount:
            raise Revert("insufficient balance")
        frm.balance -= amount
        to.balance += amount

    def events_of(self, name: str) -> list[Event]:
        return [e for e in self.events if e.name == name]
