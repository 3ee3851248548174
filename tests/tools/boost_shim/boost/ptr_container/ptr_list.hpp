// Minimal boost::ptr_list stand-in over std::list<std::unique_ptr<T>>
// with reference-yielding iterators — the subset binner.cpp uses:
// push_back(T*) (ownership transfer), begin/end with -> and * through
// the pointer, erase(it) -> it, front(), size(), empty(), and
// copy-construction of an EMPTY list (binner.cpp's emplace of
// empty_record_group).  Test-only shim; NOT part of the framework.
#ifndef TAXTK_SHIM_BOOST_PTR_LIST_HPP
#define TAXTK_SHIM_BOOST_PTR_LIST_HPP

#include <cassert>
#include <cstddef>
#include <list>
#include <memory>

namespace boost {

template <class T>
class ptr_list {
    using store_type = std::list<std::unique_ptr<T>>;
    store_type l_;

    template <class It, class Ref, class Ptr>
    class iter_base {
        It it_;

    public:
        iter_base() = default;
        explicit iter_base(It it) : it_(it) {}
        template <class It2, class Ref2, class Ptr2>
        iter_base(const iter_base<It2, Ref2, Ptr2>& o) : it_(o.raw()) {}
        Ref operator*() const { return **it_; }
        Ptr operator->() const { return it_->get(); }
        iter_base& operator++() {
            ++it_;
            return *this;
        }
        iter_base operator++(int) {
            iter_base t = *this;
            ++it_;
            return t;
        }
        bool operator==(const iter_base& o) const { return it_ == o.it_; }
        bool operator!=(const iter_base& o) const { return it_ != o.it_; }
        It raw() const { return it_; }
    };

public:
    using iterator = iter_base<typename store_type::iterator, T&, T*>;
    using const_iterator =
        iter_base<typename store_type::const_iterator, const T&, const T*>;
    using size_type = std::size_t;
    using value_type = T*;  // boost ptr containers expose the pointer

    ptr_list() = default;
    ptr_list(const ptr_list& o) { assert(o.empty()); }
    ptr_list(ptr_list&&) = default;
    ptr_list& operator=(ptr_list&&) = default;

    void push_back(T* p) { l_.emplace_back(p); }
    iterator begin() { return iterator(l_.begin()); }
    iterator end() { return iterator(l_.end()); }
    const_iterator begin() const { return const_iterator(l_.begin()); }
    const_iterator end() const { return const_iterator(l_.end()); }
    iterator erase(iterator pos) { return iterator(l_.erase(pos.raw())); }
    T& front() { return *l_.front(); }
    const T& front() const { return *l_.front(); }
    bool empty() const { return l_.empty(); }
    size_type size() const { return l_.size(); }
    void clear() { l_.clear(); }
};

}  // namespace boost

#endif
