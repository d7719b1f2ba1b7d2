/**
 * JavaScript client for the xapiand-tpu REST server (the reference ships
 * one under contrib/javascript; this is a fresh fetch-based ES module
 * mirroring the Python client's surface - xapiand_tpu/client.py).
 *
 *   import { Xapiand } from "./xapiand-client.mjs";
 *   const c = new Xapiand("http://localhost:8880");
 *   await c.documents.index("twitter", { user: "k" }, { id: "1", commit: true });
 *   const r = await c.indices.search("twitter", { _query: { user: "k" } });
 *
 * Zero dependencies (global fetch; Node >= 18 or any browser).
 */

export class TransportError extends Error {
  constructor(status, info) {
    super(`HTTP ${status}`);
    this.status = status;
    this.info = info;
  }
}
export class NotFoundError extends TransportError {}
export class ConflictError extends TransportError {}

class Transport {
  constructor(hosts, { timeout = 60000 } = {}) {
    if (typeof hosts === "string") hosts = [hosts];
    this.hosts = (hosts?.length ? hosts : ["http://localhost:8880"]).map(
      (h) => (h.includes("://") ? h : `http://${h}`).replace(/\/+$/, ""),
    );
    this.timeout = timeout;
    this._i = 0;
  }

  async perform(method, path, body = null, params = null, contentType = "application/json") {
    const q = params
      ? Object.entries(params)
          .filter(([, v]) => v !== undefined && v !== null && v !== false)
          .map(([k, v]) => (v === true ? encodeURIComponent(k) : `${encodeURIComponent(k)}=${encodeURIComponent(v)}`))
          .join("&")
      : "";
    const suffix = q ? `${path}?${q}` : path;
    let lastErr;
    for (let n = 0; n < this.hosts.length; n++) {
      const host = this.hosts[this._i % this.hosts.length];
      try {
        const resp = await fetch(host + suffix, {
          method,
          headers: body != null ? { "Content-Type": contentType } : {},
          body: body == null ? undefined : typeof body === "string" || body instanceof Uint8Array ? body : JSON.stringify(body),
          signal: AbortSignal.timeout(this.timeout),
        });
        const ct = resp.headers.get("content-type") || "";
        const out = ct.includes("json") ? await resp.json() : await resp.arrayBuffer();
        if (!resp.ok) {
          if (resp.status === 404) throw new NotFoundError(resp.status, out);
          if (resp.status === 409) throw new ConflictError(resp.status, out);
          throw new TransportError(resp.status, out);
        }
        return out;
      } catch (e) {
        if (e instanceof TransportError) throw e;
        lastErr = e;
        this._i++; // connection error: try the next host
      }
    }
    throw new TransportError(0, `no hosts reachable: ${lastErr}`);
  }
}

const esc = (s) => encodeURIComponent(String(s));

class DocumentsClient {
  constructor(t) {
    this._t = t;
  }
  index(index, body, { id = null, commit = false, version = null } = {}) {
    const params = { commit, version };
    return id == null
      ? this._t.perform("POST", `/${esc(index)}/`, body, params)
      : this._t.perform("PUT", `/${esc(index)}/${esc(id)}`, body, params);
  }
  update(index, id, body, { commit = false, version = null } = {}) {
    return this._t.perform("UPDATE", `/${esc(index)}/${esc(id)}`, body, { commit, version });
  }
  upsert(index, id, body, { commit = false, version = null } = {}) {
    return this._t.perform("UPSERT", `/${esc(index)}/${esc(id)}`, body, { commit, version });
  }
  patch(index, id, ops, { commit = false } = {}) {
    return this._t.perform("PATCH", `/${esc(index)}/${esc(id)}`, ops, { commit });
  }
  async exists(index, id) {
    try {
      await this._t.perform("HEAD", `/${esc(index)}/${esc(id)}`);
      return true;
    } catch (e) {
      if (e instanceof NotFoundError) return false;
      throw e;
    }
  }
  get(index, id, { selector = null, volatile = false } = {}) {
    return this._t.perform("GET", `/${esc(index)}/${esc(id)}`, null, { selector, volatile });
  }
  delete(index, id, { commit = false } = {}) {
    return this._t.perform("DELETE", `/${esc(index)}/${esc(id)}`, null, { commit });
  }
  info(index, id = null) {
    const p = id == null ? `/${esc(index)}/:info` : `/${esc(index)}/${esc(id)}/:info`;
    return this._t.perform("GET", p);
  }
}

class IndicesClient {
  constructor(t) {
    this._t = t;
  }
  async ping() {
    try {
      await this._t.perform("GET", "/");
      return true;
    } catch {
      return false;
    }
  }
  create(index, body = {}) {
    return this._t.perform("PUT", `/${esc(index)}/`, body);
  }
  commit(index) {
    return this._t.perform("POST", `/${esc(index)}/:commit`);
  }
  open(index) {
    return this._t.perform("OPEN", `/${esc(index)}/`);
  }
  close(index) {
    return this._t.perform("CLOSE", `/${esc(index)}/`);
  }
  snapshot(index) {
    return this._t.perform("POST", `/${esc(index)}/:snapshot`);
  }
  delete(index) {
    return this._t.perform("DELETE", `/${esc(index)}/`);
  }
  getSettings(index) {
    return this._t.perform("GET", `/${esc(index)}/:settings`);
  }
  putSettings(index, body) {
    return this._t.perform("PUT", `/${esc(index)}/:settings`, body);
  }
  getSchema(index) {
    return this._t.perform("GET", `/${esc(index)}/:schema`);
  }
  count(index, body = null, { q = null } = {}) {
    return this._t.perform("POST", `/${esc(index)}/:count`, body, { q });
  }
  search(index, body = null, params = {}) {
    return this._t.perform("POST", `/${esc(index)}/:search`, body, params);
  }
  async restore(index, docs, { batch = 2000, commitAtEnd = true } = {}) {
    let restored = 0;
    for (let s = 0; s < docs.length; s += batch) {
      const nd = docs
        .slice(s, s + batch)
        .map((d) => JSON.stringify(d))
        .join("\n");
      const out = await this._t.perform("POST", `/${esc(index)}/:restore`, nd + "\n", null, "application/x-ndjson");
      restored += out["#restored"] ?? 0;
    }
    if (commitAtEnd) await this.commit(index);
    return { "#restored": restored };
  }
}

export class Xapiand {
  constructor(hosts, opts = {}) {
    this.transport = new Transport(hosts, opts);
    this.documents = new DocumentsClient(this.transport);
    this.indices = new IndicesClient(this.transport);
  }
  ping() {
    return this.indices.ping();
  }
  info() {
    return this.transport.perform("GET", "/");
  }
  flush() {
    // admin FLUSH / (requires --admin-commands on the server)
    return this.transport.perform("FLUSH", "/");
  }
  index(index, body, opts) {
    return this.documents.index(index, body, opts);
  }
  get(index, id, opts) {
    return this.documents.get(index, id, opts);
  }
  exists(index, id) {
    return this.documents.exists(index, id);
  }
  delete(index, id, opts) {
    return this.documents.delete(index, id, opts);
  }
  search(index, body, params) {
    return this.indices.search(index, body, params);
  }
  count(index, body, opts) {
    return this.indices.count(index, body, opts);
  }
}
