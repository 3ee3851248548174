// Minimal boost::program_options stand-in sufficient to compile and run
// the reference's tool mains VERBATIM (core/taxator.cpp, binner.cpp,
// alignments-filter.cpp, taxknife.cpp): options_description with the
// chained add_options() syntax, typed value<T>() semantics
// (default_value / required / multitoken, bound targets), "long,short"
// option names, command_line_parser(...).options(...).run(),
// store/notify, variables_map::count and ::as<T>.  Help-text formatting
// is approximate (only exercised by --help, which the oracle harness
// never uses).  Test-only shim; NOT part of the framework.
#ifndef TAXTK_SHIM_BOOST_PROGRAM_OPTIONS_HPP
#define TAXTK_SHIM_BOOST_PROGRAM_OPTIONS_HPP

#include <cctype>
#include <cstdlib>
#include <iostream>
#include <type_traits>
#include <map>
#include <memory>
#include <ostream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace boost {
namespace program_options {

class error : public std::runtime_error {
public:
    explicit error(const std::string& m) : std::runtime_error(m) {}
};

class required_option : public error {
public:
    explicit required_option(const std::string& n)
        : error("missing required option: " + n) {}
};

namespace shim_detail {

template <class T>
bool cast_token(const std::string& s, T& out) {
    std::istringstream ss(s);
    ss >> out;
    return !ss.fail() && ss.eof();
}

inline bool cast_token(const std::string& s, std::string& out) {
    out = s;
    return true;
}

inline bool cast_token(const std::string& s, bool& out) {
    if (s == "1" || s == "true" || s == "on" || s == "yes") out = true;
    else if (s == "0" || s == "false" || s == "off" || s == "no")
        out = false;
    else return false;
    return true;
}

struct holder_base {
    virtual ~holder_base() = default;
};

template <class T>
struct holder : holder_base {
    T v;
    explicit holder(const T& x) : v(x) {}
};

}  // namespace shim_detail

class value_semantic {
public:
    virtual ~value_semantic() = default;
    virtual bool takes_value() const = 0;
    virtual bool multitoken() const = 0;
    virtual bool required() const = 0;
    // consume one occurrence's tokens; returns the accumulated value
    virtual std::shared_ptr<shim_detail::holder_base> parse(
        const std::vector<std::string>& tokens,
        std::shared_ptr<shim_detail::holder_base> prev) const = 0;
    virtual std::shared_ptr<shim_detail::holder_base> default_holder()
        const = 0;
    virtual void notify(
        const std::shared_ptr<shim_detail::holder_base>& h) const = 0;
};

namespace shim_detail {

template <class T>
struct accumulate {
    static std::shared_ptr<holder_base> add(
        const std::vector<std::string>& toks,
        std::shared_ptr<holder_base>) {
        if (toks.empty()) throw error("option requires a value");
        T v;
        if (!cast_token(toks.back(), v))
            throw error("bad option value: " + toks.back());
        return std::make_shared<holder<T>>(v);
    }
};

template <class E>
struct accumulate<std::vector<E>> {
    static std::shared_ptr<holder_base> add(
        const std::vector<std::string>& toks,
        std::shared_ptr<holder_base> prev) {
        std::vector<E> v;
        if (prev) v = static_cast<holder<std::vector<E>>*>(prev.get())->v;
        for (const auto& t : toks) {
            E e;
            if (!cast_token(t, e)) throw error("bad option value: " + t);
            v.push_back(e);
        }
        return std::make_shared<holder<std::vector<E>>>(v);
    }
};

template <class T>
struct is_vector {
    static const bool value = false;
};
template <class E>
struct is_vector<std::vector<E>> {
    static const bool value = true;
};

}  // namespace shim_detail

template <class T>
class typed_value : public value_semantic {
public:
    explicit typed_value(T* target) : target_(target) {}
    typed_value* default_value(const T& v) {
        default_.reset(new T(v));
        return this;
    }
    typed_value* required() {
        required_ = true;
        return this;
    }
    typed_value* multitoken() {
        multitoken_ = true;
        return this;
    }
    bool takes_value() const override { return true; }
    bool multitoken() const override { return multitoken_; }
    // NOTE: hidden by the 0-arg required() above in C++? disambiguate:
    bool required() const override { return required_; }

    std::shared_ptr<shim_detail::holder_base> parse(
        const std::vector<std::string>& toks,
        std::shared_ptr<shim_detail::holder_base> prev) const override {
        return shim_detail::accumulate<T>::add(toks, prev);
    }
    std::shared_ptr<shim_detail::holder_base> default_holder()
        const override {
        if (!default_) return nullptr;
        return std::make_shared<shim_detail::holder<T>>(*default_);
    }
    void notify(const std::shared_ptr<shim_detail::holder_base>& h)
        const override {
        if (target_ && h)
            *target_ = static_cast<shim_detail::holder<T>*>(h.get())->v;
    }

private:
    T* target_;
    std::unique_ptr<T> default_;
    bool required_ = false;
    bool multitoken_ = false;
};

template <class T>
typed_value<T>* value(T* target) {
    return new typed_value<T>(target);
}

template <class T>
typed_value<T>* value() {
    return new typed_value<T>(nullptr);
}

struct option_info {
    std::string long_name, short_name, desc;
    std::shared_ptr<value_semantic> sem;  // null = flag
};

class options_description;

class options_description_easy_init {
public:
    explicit options_description_easy_init(options_description* owner)
        : owner_(owner) {}
    options_description_easy_init& operator()(const char* name,
                                              const char* desc);
    options_description_easy_init& operator()(const char* name,
                                              const value_semantic* sem,
                                              const char* desc);

private:
    options_description* owner_;
};

class options_description {
public:
    options_description() = default;
    explicit options_description(const std::string& caption)
        : caption_(caption) {}
    options_description_easy_init add_options() {
        return options_description_easy_init(this);
    }
    options_description& add(const options_description& other) {
        for (const auto& o : other.options_) options_.push_back(o);
        return *this;
    }
    void add_option(const char* name, const value_semantic* sem,
                    const char* desc) {
        option_info oi;
        std::string n(name);
        auto comma = n.rfind(',');
        if (comma != std::string::npos && comma + 2 == n.size()) {
            oi.long_name = n.substr(0, comma);
            oi.short_name = n.substr(comma + 1);
        } else {
            oi.long_name = n;
        }
        oi.desc = desc;
        oi.sem.reset(const_cast<value_semantic*>(sem));
        options_.push_back(
            std::shared_ptr<option_info>(new option_info(oi)));
    }
    const std::vector<std::shared_ptr<option_info>>& options() const {
        return options_;
    }
    const std::string& caption() const { return caption_; }

private:
    std::string caption_;
    std::vector<std::shared_ptr<option_info>> options_;
};

inline options_description_easy_init& options_description_easy_init::
operator()(const char* name, const char* desc) {
    owner_->add_option(name, nullptr, desc);
    return *this;
}

inline options_description_easy_init& options_description_easy_init::
operator()(const char* name, const value_semantic* sem,
           const char* desc) {
    owner_->add_option(name, sem, desc);
    return *this;
}

inline std::ostream& operator<<(std::ostream& os,
                                const options_description& od) {
    os << od.caption() << ":\n";
    for (const auto& o : od.options()) {
        os << "  --" << o->long_name;
        if (!o->short_name.empty()) os << " [ -" << o->short_name << " ]";
        if (o->sem) os << " arg";
        os << "\n        " << o->desc << "\n";
    }
    return os;
}

class variable_value {
public:
    variable_value() = default;
    explicit variable_value(std::shared_ptr<shim_detail::holder_base> h)
        : h_(h) {}
    template <class T>
    const typename std::remove_cv<T>::type& as() const {
        using U = typename std::remove_cv<T>::type;
        auto* hp = dynamic_cast<shim_detail::holder<U>*>(h_.get());
        if (!hp) throw error("variables_map::as: type mismatch");
        return hp->v;
    }
    bool empty() const { return !h_; }

private:
    std::shared_ptr<shim_detail::holder_base> h_;
};

struct parsed_options {
    const options_description* desc = nullptr;
    // per-option occurrence tokens, keyed by long name
    std::map<std::string, std::vector<std::vector<std::string>>> occ;
};

class variables_map {
public:
    std::size_t count(const std::string& name) const {
        return vm_.count(name) ? 1 : 0;
    }
    const variable_value& operator[](const std::string& name) const {
        static const variable_value empty;
        auto it = vm_.find(name);
        return it == vm_.end() ? empty : it->second;
    }
    // internals for store()/notify()
    std::map<std::string, variable_value> vm_;
    parsed_options parsed_;
};

class positional_options_description {
public:
    positional_options_description& add(const char* name, int max_count) {
        name_ = name;
        max_count_ = max_count;
        return *this;
    }
    const std::string& name() const { return name_; }
    int max_count() const { return max_count_; }

private:
    std::string name_;
    int max_count_ = 0;
};

class command_line_parser {
public:
    command_line_parser(int argc, char** argv) {
        for (int i = 1; i < argc; ++i) args_.push_back(argv[i]);
    }
    command_line_parser& options(const options_description& desc) {
        desc_ = &desc;
        return *this;
    }
    command_line_parser& positional(
        const positional_options_description& pos) {
        pos_ = &pos;
        return *this;
    }
    parsed_options run() {
        parsed_options out;
        out.desc = desc_;
        auto find = [&](const std::string& tok)
            -> std::shared_ptr<option_info> {
            for (const auto& o : desc_->options()) {
                if (tok.size() > 2 && tok.compare(0, 2, "--") == 0 &&
                    tok.substr(2) == o->long_name)
                    return o;
                if (tok.size() == 2 && tok[0] == '-' &&
                    !o->short_name.empty() && tok[1] == o->short_name[0])
                    return o;
            }
            return nullptr;
        };
        auto optionlike = [](const std::string& t) {
            // "-x"/"--x" look like options; "-1"/"-.5" are values
            return t.size() > 1 && t[0] == '-' &&
                   !std::isdigit(static_cast<unsigned char>(t[1])) &&
                   t[1] != '.';
        };
        int positional_used = 0;
        for (std::size_t i = 0; i < args_.size(); ++i) {
            if (args_[i].empty() || args_[i][0] != '-') {
                // positional token
                if (!pos_ || positional_used >= pos_->max_count())
                    throw error("unexpected positional: " + args_[i]);
                ++positional_used;
                out.occ[pos_->name()].push_back({args_[i]});
                continue;
            }
            auto o = find(args_[i]);
            if (!o) throw error("unknown option: " + args_[i]);
            std::vector<std::string> toks;
            if (o->sem) {
                if (i + 1 >= args_.size())
                    throw error("option requires a value: " + args_[i]);
                toks.push_back(args_[++i]);  // next token IS the value
                if (o->sem->multitoken())
                    while (i + 1 < args_.size() && !optionlike(args_[i + 1]))
                        toks.push_back(args_[++i]);
            }
            out.occ[o->long_name].push_back(toks);
        }
        return out;
    }

private:
    std::vector<std::string> args_;
    const options_description* desc_ = nullptr;
    const positional_options_description* pos_ = nullptr;
};

inline void store(const parsed_options& parsed, variables_map& vm) {
    vm.parsed_ = parsed;
    for (const auto& kv : parsed.occ) {
        const option_info* oi = nullptr;
        for (const auto& o : parsed.desc->options())
            if (o->long_name == kv.first) oi = o.get();
        if (!oi) continue;
        if (!oi->sem) {  // flag
            vm.vm_[kv.first] = variable_value(
                std::make_shared<shim_detail::holder<bool>>(true));
            continue;
        }
        std::shared_ptr<shim_detail::holder_base> acc;
        for (const auto& toks : kv.second)
            acc = oi->sem->parse(toks, acc);
        vm.vm_[kv.first] = variable_value(acc);
    }
}

inline void notify(variables_map& vm) {
    if (!vm.parsed_.desc) return;
    for (const auto& o : vm.parsed_.desc->options()) {
        if (!o->sem) continue;
        auto it = vm.vm_.find(o->long_name);
        if (it != vm.vm_.end() && !it->second.empty()) {
            auto occ = vm.parsed_.occ.find(o->long_name);
            std::shared_ptr<shim_detail::holder_base> acc;
            for (const auto& toks : occ->second)
                acc = o->sem->parse(toks, acc);
            o->sem->notify(acc);
        } else {
            auto dh = o->sem->default_holder();
            if (dh) {
                vm.vm_[o->long_name] = variable_value(dh);
                o->sem->notify(dh);
            } else if (o->sem->required()) {
                throw required_option(o->long_name);
            }
        }
    }
}

}  // namespace program_options
}  // namespace boost

#endif
